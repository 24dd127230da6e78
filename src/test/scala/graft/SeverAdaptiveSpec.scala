package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The size-adaptive severed shingle index (round-20 optimization)
  * must be a pure materialization choice: forcing the severed (big-
  * corpus) path and the recompute (small-corpus) path must produce the
  * identical pair set — including the per-doc set sizes, which the
  * severed path derives from the index group-count instead of the
  * map-only size(distinct_shingles) expression. */
class SeverAdaptiveSpec extends AnyFunSuite {
  import SharedSpark._

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  private def pairsWithThreshold(bytes: Long): Array[(Long, Long, Double)] = {
    spark.conf.set(Dedup.SeverIndexBytesKey, bytes.toString)
    try {
      Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    } finally {
      spark.conf.unset(Dedup.SeverIndexBytesKey)
      graft.util.IntermediateCaches.releaseAll(blocking = true)
    }
  }

  test("severed index path == recompute path (jaccard pairs + values)") {
    val severed = pairsWithThreshold(0L)            // always sever
    val recomputed = pairsWithThreshold(Long.MaxValue)  // never sever
    assert(severed.nonEmpty, "fixture corpus must contain near-dup pairs")
    assert(severed.sameElements(recomputed))
  }

  test("winnowRecall row identical under both sever modes") {
    def run(bytes: Long) = {
      spark.conf.set(Dedup.SeverIndexBytesKey, bytes.toString)
      try graft.queries.LlmOps.winnowRecall(spark, "/root/testdata/sf0.001")
        .collect().map(_.toString).toSeq
      finally {
        spark.conf.unset(Dedup.SeverIndexBytesKey)
        graft.util.IntermediateCaches.releaseAll(blocking = true)
      }
    }
    assert(run(0L) == run(Long.MaxValue))
  }
}
