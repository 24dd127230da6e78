package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text._

/** The codegen'd NormTextExpr / NormTokens pair (round-19 optimization)
  * must be BUG-FOR-BUG identical to
  * `regexp_replace(lower(trim(c)), "\\s+", " ")` and
  * `split(norm, " ")` — every oracle's NormSql assumes exactly that
  * normalization, and the fingerprint gates hash the normalized
  * string itself. Edge fixtures cover each documented subtlety: trim
  * strips ASCII spaces ONLY, `\s` is the ASCII class, trailing
  * empties survive the split, unicode falls back to locale lowercase. */
class NormTokensSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val fixtures = Seq(
    "plain lower text",
    "  leading and trailing spaces  ",
    "MiXeD CaSe TEXT",
    "tab\tseparated\ttokens",
    "newline\nseparated\nlines",
    "\tws edges survive trim\n",          // trim strips ' ' only
    "multiple   spaces\t\t\tand\n\n\nruns",
    "verticaltab and form\ffeed and cr\r",
    "",
    " ",
    "   ",
    "one",
    "CAFÉ Touché ÜBER Straße",             // non-ASCII lowercase path
    "世界 MIXED ascii 漢字",
    "ÀÉÎÕÜ àéîõü",
    "a" * 5000 + " END")

  test("NormTextExpr == regexp_replace(lower(trim(c)), \\s+, ' ')") {
    val r = fixtures.toDF("v").select(
      norm_text(col("v")).as("fast"),
      norm_text_builtin(col("v")).as("ref")).collect()
    r.zip(fixtures).foreach { case (row, f) =>
      assert(row.getString(0) == row.getString(1), s"fixture '${f.take(40)}'")
    }
  }

  test("NormTokens == split(norm, ' ') including empty-token edges") {
    val r = fixtures.toDF("v").select(
      tokens(col("v")).as("fast"),
      tokens_builtin(col("v")).as("ref")).collect()
    r.zip(fixtures).foreach { case (row, f) =>
      assert(row.getSeq[String](0) == row.getSeq[String](1),
        s"fixture '${f.take(40)}'")
    }
  }

  test("parity holds over the whole sf0.001 corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = docs.select(
        norm_text(col("text")).as("fast"),
        norm_text_builtin(col("text")).as("ref"),
        tokens(col("text")).as("tf"),
        tokens_builtin(col("text")).as("tr"))
      .filter(col("fast") =!= col("ref") || col("tf") =!= col("tr"))
      .count()
    assert(bad == 0L)
  }

  test("Norm expressions generate compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = fixtures.take(4).toDF("v")
        .select(norm_text(col("v")).as("n"), tokens(col("v")).as("t")).collect()
      assert(r.length == 4 && r.forall(x => !x.isNullAt(0) && !x.isNullAt(1)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
