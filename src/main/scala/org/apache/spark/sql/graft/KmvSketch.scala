package org.apache.spark.sql.graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch as a typed [[Aggregator]]
  * (the same partial-aggregable UDAF surface as `ExactAvgAggregator`):
  * the buffer is the sorted array of the `k` smallest DISTINCT hash
  * values seen so far — bounded at `k` longs per group no matter how
  * many rows flow through, which is the whole point at corpus scale
  * (exact COUNT(DISTINCT) holds every distinct value in the hash
  * aggregate; this holds 64).
  *
  * Determinism: the k smallest distinct values of a set are a function
  * of the SET — insertion order, partitioning, and merge order cannot
  * change the result, so the sketch (and any estimate derived from it)
  * is bit-stable across engines and runs. With uniform 60-bit hashes
  * the classic KMV estimator is `(k-1) / frac(h_k)` where `frac` maps
  * the k-th smallest hash onto [0,1) — see `Sketch.kmvEstimate`.
  *
  * Input contract: non-negative 60-bit hashes (`Sketch.hash60`); the
  * aggregator itself just keeps k smallest distinct longs.
  */
case class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, a)
    if (pos >= 0) b // already present: distinct semantics
    else {
      val ins = -pos - 1
      if (ins >= k) b // larger than the current k-th smallest: no-op
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = a
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, keep the k smallest
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = KmvAggregator.longArrayEncoder
  override def outputEncoder: Encoder[Array[Long]] = KmvAggregator.longArrayEncoder
}

object KmvAggregator {
  private val longArrayEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
