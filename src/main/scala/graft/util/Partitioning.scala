package graft.util

import org.apache.spark.sql.DataFrame

/** Partition-count hygiene for CPU-heavy map stages. */
object Partitioning {

  /** Repartition ONLY when the input is narrower than the cluster's
    * parallelism. Small local corpora arrive as one parquet file = one
    * partition, which serializes CPU-heavy transforms (shingling,
    * minhash, vector math) — an explicit repartition (which AQE will not
    * coalesce) spreads them. A 100 TB input already has thousands of
    * partitions: repartitioning it would be a pointless full round-robin
    * shuffle of the corpus, so wide inputs pass through untouched. */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
