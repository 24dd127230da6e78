package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for within-bucket pair generation (the LSH/SimHash
  * banding self-joins). AQE's skew-join split handles skewed *sort-merge
  * join partitions*, but a single hot bucket key still lands every one
  * of its rows in one task on both sides — the join's O(hot²) work can't
  * be split by partition-level rebalancing because it all shares one key.
  *
  * Triangle partitioning fixes that at the plan level: rows are chunked
  * by a deterministic hash into `salt` chunks, and the all-pairs work of
  * a bucket is decomposed into the salt·(salt+1)/2 chunk-cells of its
  * upper triangle — each cell an independent shuffle key, so the hot
  * bucket spreads across ~salt²/2 tasks instead of one straggler.
  *
  * Cost: the left side is replicated ≤ salt−chunk times and the right
  * ≤ chunk+1 times (avg (salt+1)/2 each) — linear replication for a
  * quadratic split of the straggler, the standard trade for all-pairs
  * skew (cf. the "triangle enumeration" / theta-join sharding literature).
  */
object Skew {

  /** All distinct pairs (id_a < id_b) of rows sharing every column in
    * `bucketCols` — semantically identical to
    * {{{
    * df.as("x").join(df.as("y"),
    *   bucketCols.map(k => col("x."+k) === col("y."+k)).reduce(_ && _)
    *     && col("x."+idCol) < col("y."+idCol))
    *   .select(x.id as "doc_a", y.id as "doc_b").distinct()
    * }}}
    * but skew-tolerant: a bucket's pair work is spread over
    * salt·(salt+1)/2 shuffle keys. `salt = 1` degenerates to the plain
    * self-join shape (one cell per bucket). */
  def saltedSelfJoinPairs(df: DataFrame, bucketCols: Seq[String],
      idCol: String, salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val reserved = Set("_chunk", "_c", "_d") intersect df.columns.toSet
    require(reserved.isEmpty,
      s"input columns collide with salting internals: ${reserved.mkString(", ")}")
    val chunk: Column = pmod(xxhash64(col(idCol)), lit(salt)).cast("int")
    // left: a chunk-c row participates as the ROW coordinate of cells
    // (c, d) for d in c..salt-1; right: as the COLUMN coordinate of
    // cells (c, d) for c in 0..d. Every unordered pair meets in exactly
    // one cell (its chunks sorted); same-chunk pairs meet in the
    // diagonal cell in both orientations — least/greatest + distinct
    // canonicalizes.
    val withChunk = df.withColumn("_chunk", chunk)
    val left = withChunk
      .withColumn("_d", explode(sequence(col("_chunk"), lit(salt - 1))))
      .withColumnRenamed("_chunk", "_c")
    val right = withChunk
      .withColumn("_c", explode(sequence(lit(0), col("_chunk"))))
      .withColumnRenamed("_chunk", "_d")
    val keys = bucketCols ++ Seq("_c", "_d")
    val joined = left.as("x").join(right.as("y"),
      keys.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
        col(s"x.$idCol") =!= col(s"y.$idCol"))
    joined.select(
        least(col(s"x.$idCol"), col(s"y.$idCol")).as("doc_a"),
        greatest(col(s"x.$idCol"), col(s"y.$idCol")).as("doc_b"))
      .distinct()
  }
}
