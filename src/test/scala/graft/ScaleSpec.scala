package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.util.Skew

/** Scale-path plumbing: skew-salted self-join equivalence and runtime
  * bloom-filter pruning of a selective fact join. */
class ScaleSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("saltedSelfJoinPairs == plain self-join pairs, every salt") {
    // skewed buckets on purpose: one hot bucket with 12 members
    val rows = (Seq.tabulate(12)(i => (i.toLong, "hot")) ++
      Seq((100L, "b1"), (101L, "b1"), (200L, "b2"), (300L, "solo")))
      .toDF("doc", "bucket")
    val plain = rows.as("x").join(rows.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain.size == 12 * 11 / 2 + 1)
    for (salt <- Seq(1, 2, 3, 5, 8)) {
      val salted = Skew.saltedSelfJoinPairs(rows, Seq("bucket"), "doc", salt)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(salted == plain, s"salt=$salt: ${salted.size} vs ${plain.size}")
    }
  }

  test("minhash LSH candidates identical with and without banding salt") {
    val docs = Tables.documents(spark, sf0001)
    val unsalted = Dedup.minhashLshCandidates(docs, n = 3, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Dedup.minhashLshCandidates(docs, n = 3, numHashes = 64, bands = 16,
        salt = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unsalted.nonEmpty && salted == unsalted)
  }

  test("cosineLshPairs on an empty corpus returns an empty frame with the right schema") {
    val empty = spark.emptyDataset[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = graft.similarity.Ann.cosineLshPairs(empty, 0.5)
    assert(out.columns.toSeq == Seq("va", "vb", "sim"))
    assert(out.count() == 0)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // 100 TB shape: a selective dimension filter (part, p_size < 3)
    // should reach the fact scan (lineitem) as a row-level bloom filter
    // when neither side broadcasts — Catalyst's InjectRuntimeFilter does
    // this without any operator-side code, PROVIDED the join is a
    // shuffle join and the creation side is filtered & small. This spec
    // pins the behavior (and the config surface) so the capability is
    // demonstrated and guarded.
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.getOption(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // the gate: app side must look big enough to be worth filtering —
    // local test files are far below the 10 GB default
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables.lineitem(spark, sf0001)
      val part = Tables.part(spark, sf0001).filter(col("p_size") < 3)
      val joined = li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_size")).agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"expected an injected bloom filter in:\n$plan")
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
