package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text._

/** The fused QualityScoreExpr / LangIdExpr (round-19 optimization)
  * must be VALUE-IDENTICAL to the combinator formulations — the
  * quality/mix/langid oracles hash-pin the rounded score and the
  * language string. Fixtures exercise the documented edge semantics:
  * code-point length (supplementary chars), empty/whitespace docs
  * (NaN punct ratio passes through round), stopword-free docs,
  * marker ties, CJK short-circuit. */
class TextSignalsSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val fixtures = Seq(
    "the quick brown fox is in a tree of dreams",
    "no stop words here whatsoever friends",
    "punct!! heavy?? doc;; with-(lots)-of|marks",
    "a",
    "der die und der die und",
    "el los una texto",
    "le les des texte ici",
    "the der el le tie breaker",
    "世界 mixed with the ascii",
    "😀 emoji 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 supplementary chars the a of",
    (1 to 300).map(i => s"w$i").mkString(" "),  // len > 500 saturates
    "the " * 100)

  test("QualityScoreExpr == the combinator quality_score_from") {
    val df = fixtures.toDF("text")
      .select(col("text"), norm_text(col("text")).as("norm"))
      .select(col("text"), col("norm"), split(col("norm"), " ").as("t"))
    val r = df.select(
      quality_score_from(col("norm")).as("fast"),
      quality_score_from_builtin(col("norm"), col("t")).as("ref")).collect()
    r.zip(fixtures).foreach { case (row, f) =>
      val (a, b) = (row.getDouble(0), row.getDouble(1))
      assert(a == b || (a.isNaN && b.isNaN), s"fixture '${f.take(40)}': $a vs $b")
    }
  }

  test("empty norm throws like the ANSI builtin (divide-by-zero parity)") {
    // the builtin chain throws DIVIDE_BY_ZERO under Spark 4 ANSI mode;
    // the fused expression must fail fast too, not return NaN
    def crashes(c: org.apache.spark.sql.Column): Boolean =
      try {
        Seq("").toDF("norm")
          .select(c.as("q")).collect(); false
      } catch { case _: Throwable => true }
    assert(crashes(quality_score_from(col("norm"))))
    assert(crashes(quality_score_from_builtin(col("norm"), split(col("norm"), " "))))
  }

  test("LangIdExpr == the combinator lang_id_from") {
    val df = fixtures.toDF("text")
      .select(col("text"), tokens(col("text")).as("t"))
    val r = df.select(
      lang_id_from(col("text")).as("fast"),
      lang_id_from_builtin(col("text"), col("t")).as("ref")).collect()
    r.zip(fixtures).foreach { case (row, f) =>
      assert(row.getString(0) == row.getString(1), s"fixture '${f.take(40)}'")
    }
  }

  test("parity holds over the whole sf0.001 corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"), norm_text(col("text")).as("norm"))
      .select(col("text"), col("norm"), split(col("norm"), " ").as("t"))
    val bad = docs.select(
        quality_score_from(col("norm")).as("qf"),
        quality_score_from_builtin(col("norm"), col("t")).as("qr"),
        lang_id_from(col("text")).as("lf"),
        lang_id_from_builtin(col("text"), col("t")).as("lr"))
      .filter(col("qf") =!= col("qr") || col("lf") =!= col("lr"))
      .count()
    assert(bad == 0L)
  }

  test("TextSignals expressions generate compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = fixtures.take(3).toDF("text")
        .select(quality_score(col("text")).as("q"), lang_id(col("text")).as("l"))
        .collect()
      assert(r.length == 3 && r.forall(x => !x.isNullAt(1)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
