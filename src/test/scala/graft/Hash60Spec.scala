package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The codegen'd Hash60 expression must be VALUE-IDENTICAL to the
  * builtin chain `conv(substring(md5(cast(v as binary)), 1, 15), 16,
  * 10)` it replaced (round-19 optimization) — every sketch-family
  * oracle (CMS, KMV, Bloom, hashed-n-gram features) replays that chain
  * in DuckDB, so a single divergent bit anywhere breaks hash-pinned
  * gates. Pinned over ASCII, unicode (multi-byte UTF-8), empty string,
  * whitespace, long strings, and the seeded prefix form. */
class Hash60Spec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val fixtures = Seq(
    "", " ", "a", "the quick brown fox", "0", "123|x",
    "café touché", "世界 ascii mix",
    "x" * 10000, "tok1 tok2 tok3", "line\nbreak\ttab",
    "😀 emoji surrogate pair")

  test("Hash60 equals the builtin md5-hex-conv chain on every fixture") {
    val df = fixtures.toDF("v")
    val r = df.select(
      graft.sketch.Sketch.hash60(col("v")).as("fast"),
      graft.sketch.Sketch.hash60Builtin(col("v")).as("ref")).collect()
    r.zip(fixtures).foreach { case (row, f) =>
      assert(row.getLong(0) == row.getLong(1), s"fixture '$f'")
      assert(row.getLong(0) >= 0L, s"non-negative: '$f'")
    }
  }

  test("seeded Hash60 equals hash60(seed || '|' || v) for every seed") {
    val df = fixtures.toDF("v")
    (0 until 5).foreach { seed =>
      val r = df.select(
        org.apache.spark.sql.graft.Hash60.hash60Seeded(col("v"), seed).as("fast"),
        graft.sketch.Sketch.hash60Builtin(
          concat(lit(s"$seed|"), col("v"))).as("ref")).collect()
      r.foreach(row => assert(row.getLong(0) == row.getLong(1), s"seed $seed"))
    }
  }

  test("Hash60 null propagates like the builtin chain") {
    val r = Seq[Option[String]](Some("a"), None).toDF("v")
      .select(graft.sketch.Sketch.hash60(col("v")).as("h")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }
}
