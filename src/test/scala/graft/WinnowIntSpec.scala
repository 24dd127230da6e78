package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The int-valued winnow fingerprints (round-19 optimization, the
  * winnowPairs join key) must be the exact unsigned-32-bit bijection of
  * the hex-string fingerprints — same selected positions, same per-doc
  * sets, same shared-count pairs. */
class WinnowIntSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val docs = Seq(
    (1L, (1 to 30).map(i => s"tok$i").mkString(" ")),
    (2L, (5 to 34).map(i => s"tok$i").mkString(" ")),
    (3L, "short one"),
    (4L, "  Padded\twhitespace\n doc with MIXED case and répétition "),
    (5L, Seq.fill(20)("same").mkString(" ")))

  test("int fingerprints are the unsigned bijection of the hex strings") {
    val (k, w) = (3, 4)
    val df = docs.toDF("doc_id", "text")
    val r = df.select(
      graft.text.winnow_fingerprint_set(col("text"), k, w).as("hex"),
      org.apache.spark.sql.graft.WinnowFingerprintInts
        .winnow_fingerprint_ints(col("text"), k, w).as("ints")).collect()
    r.foreach { row =>
      val hex = row.getSeq[String](0)
      val ints = row.getSeq[Int](1)
      assert(ints == hex.map(h => java.lang.Integer.parseUnsignedInt(h, 16)),
        "bijection + order must hold")
    }
  }

  test("winnowPairs pair set matches the hex-keyed formulation") {
    val (k, w, minShared) = (3, 4, 3L)
    val df = docs.toDF("doc_id", "text")
    val fast = graft.dedup.Dedup.winnowPairs(df, k, w, minShared)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // hex-keyed reference, inlined from the pre-round-19 formulation
    val idx = df.select(col("doc_id").as("doc"),
      explode(graft.text.winnow_fingerprint_set(col("text"), k, w)).as("f"))
    val ref = idx.as("a").join(idx.as("b"), col("a.f") === col("b.f") &&
        col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == ref)
    assert(fast.nonEmpty, "fixture must produce at least one pair")
  }
}
