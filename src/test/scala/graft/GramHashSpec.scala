package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The one-pass GramHash60s / PosTokenHash60s expressions (round-19
  * optimization) must be VALUE-IDENTICAL to the HOF formulations they
  * replaced in d_dup_spans / t_pipeline_spans — those gates' oracles
  * hash-pin the downstream values (t_pipeline_spans' clean_fp is a
  * bit_xor OVER the ph hashes), so a single divergent long breaks
  * hash-verified gates. */
class GramHashSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val docs = Seq(
    "a b c d e f g h i j",
    "one two three four five six seven eight",
    "exactly eight tokens in this doc here now",
    "short doc",                       // fewer tokens than n=8
    "a",                               // single token
    "",                                // empty after split -> [""]
    "café touché déjà vu encore une fois voilà paris",
    "rep rep rep rep rep rep rep rep rep")

  private def tok = split(col("text"), " ")

  test("GramHash60s equals the HOF hash60(concat_ws(slice)) formulation") {
    for (n <- Seq(2, 3, 8)) {
      val df = docs.toDF("text").select(col("text"), tok.as("t"))
      val r = df.select(
        org.apache.spark.sql.graft.GramHash60s.gram_hash60s(col("t"), n).as("fast"),
        when(size(col("t")) >= n,
          transform(sequence(lit(0), size(col("t")) - n),
            i => graft.sketch.Sketch.hash60Builtin(
              concat_ws(" ", slice(col("t"), i + lit(1), lit(n))))))
          .otherwise(array().cast("array<bigint>")).as("ref")).collect()
      r.zip(docs).foreach { case (row, d) =>
        assert(row.getSeq[Long](0) == row.getSeq[Long](1), s"n=$n doc='$d'")
      }
    }
  }

  test("PosTokenHash60s equals the HOF hash60(i || '|' || tok) formulation") {
    val df = docs.toDF("text").select(tok.as("t"))
    val r = df.select(
      org.apache.spark.sql.graft.PosTokenHash60s.pos_token_hash60s(col("t")).as("fast"),
      transform(col("t"), (w, i) => graft.sketch.Sketch.hash60Builtin(
        concat(i.cast("string"), lit("|"), w))).as("ref")).collect()
    r.zip(docs).foreach { case (row, d) =>
      assert(row.getSeq[Long](0) == row.getSeq[Long](1), s"doc='$d'")
    }
  }

  test("GramHash60s + PosTokenHash60s generate compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = docs.take(3).toDF("text")
        .select(
          org.apache.spark.sql.graft.GramHash60s.gram_hash60s(tok, 3).as("g"),
          org.apache.spark.sql.graft.PosTokenHash60s.pos_token_hash60s(tok).as("p"))
        .collect()
      assert(r.length == 3 && r.forall(x => !x.isNullAt(0) && !x.isNullAt(1)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
