package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join: match points to the intervals
  * containing them WITHOUT an equality key. Spark plans a bare
  * `p JOIN i ON pt BETWEEN lo AND hi` as BroadcastNestedLoopJoin —
  * all-pairs at scale. Discretizing the range domain into fixed-width
  * buckets turns it into an equi-join: each interval replicates into
  * the ⌈span/width⌉ buckets it overlaps, each point lands in exactly
  * ONE bucket, they hash-join on the bucket id, and the exact
  * `BETWEEN` filter runs on the matched candidates only.
  *
  * Because a point has exactly one bucket, no pair can match twice —
  * no distinct needed. Cost: one shuffle of |P| + |I|·avg_spans rows
  * and candidate checks proportional to points × intervals-per-bucket
  * (pick `bucketWidth` near the typical interval span so avg_spans
  * stays 1-2). This is the same shape DuckDB's IEJoin optimizes
  * natively — which is what oracles the gate query.
  */
object RangeJoin {

  /** Inner join of `points` to every containing interval
    * (`lo ≤ pt ≤ hi`, inclusive). All three columns must be LongType
    * in the same unit (e.g. unix micros); column names across the two
    * inputs must be disjoint. */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty, s"column names must be disjoint, both have: $overlap")
    // exact integer division (`div`), not double `/`: bucket ids stay
    // precise for 64-bit units like unix micros
    val p = points.withColumn("_bucket", expr(s"$ptCol div ${bucketWidth}L"))
    val i = intervals.withColumn("_bucket",
      explode(sequence(expr(s"$loCol div ${bucketWidth}L"), expr(s"$hiCol div ${bucketWidth}L"))))
    p.join(i, "_bucket")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bucket")
  }
}
