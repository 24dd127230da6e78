package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.KmvAggregator

/** Bounded-state cardinality and frequency sketches for corpus-scale
  * profiling. Exact COUNT(DISTINCT) and exact heavy-hitter counting
  * hold state proportional to the number of distinct values — at 100 TB
  * of token/shingle streams that is the scale-killer; these hold k
  * longs (KMV) or depth×width counters (CountMin) per group regardless
  * of input size, and both are fully DETERMINISTIC (md5-derived hashes,
  * set-minima, integer counters), so unlike RNG-seeded sketch libraries
  * every estimate is reproducible across engines, runs, and partition
  * layouts — each sketch gate hash-matches a DuckDB replay.
  *
  * Scale shape: both sketches are classic partial-aggregables — the KMV
  * buffer and the CMS bucket counts combine map-side, so the shuffle
  * carries one bounded sketch per group (KMV) or at most depth×width
  * rows total (CMS), never the value stream.
  */
object Sketch {

  /** Engine-portable 60-bit non-negative hash: first 15 hex chars of
    * the value's md5 read as an integer. DuckDB recomputes it as
    * `CAST('0x' || substr(md5(v), 1, 15) AS BIGINT)` — same md5 bytes,
    * same hex prefix, same value; 60 bits keeps every downstream
    * product (width modulo, estimator division) inside BIGINT/exact-
    * double range. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** KMV sketch aggregate: sorted array of the k smallest distinct
    * [[hash60]] values in the group (shorter when the group has fewer
    * distinct values — then the sketch IS the exact distinct set). */
  def kmv_sketch(hash: Column, k: Int): Column =
    udaf(KmvAggregator(k), Encoders.scalaLong)(hash)

  /** KMV cardinality estimate from a [[kmv_sketch]] array: exact size
    * when the sketch never filled (we saw every distinct value);
    * otherwise `(k-1) / frac(h_k)` with `frac(h) = h / 2^60`, i.e. one
    * exact-double multiply and one IEEE division — deterministic.
    * `round(4)` fixes the decimal form for cross-engine hashing. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble * KmvSpace) / get(sketch, lit(k - 1)).cast("double"), 4))

  /** 2^60 as an exact double (6 significant bits). */
  val KmvSpace: Double = math.pow(2, 60)

  /** CountMin bucket of a value under hash row `seed`:
    * hash60(seed || '|' || v) mod width. Non-negative input keeps `%`
    * identical across engines. */
  def cmsBucket(c: Column, seed: Int, width: Int): Column =
    hash60(concat(lit(seed.toString), lit("|"), c)) % width

  /** CountMin sketch of a value column: (seed, bucket, cnt) with
    * depth×width rows at most — ONE narrow aggregation regardless of
    * input size; counts are exact integers (no saturation). */
  def cmsSketch(values: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame =
    values.select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("seed"),
          cmsBucket(col(valueCol), i, width).as("bucket"))): _*)).as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Bloom bit position of `value` under hash row `seed`:
    * hash60(seed || '|' || v) mod m — [[cmsBucket]] widened to a Long
    * modulus (a production Bloom over 10⁹ members needs m ≈ 8·10⁹
    * positions, past Int). Non-negative, engine-portable. */
  def bloomPos(c: Column, seed: Int, m: Long): Column =
    hash60(concat(lit(seed.toString), lit("|"), c)) % m

  /** The SET-BIT table of a Bloom filter over `values`: one row per
    * distinct set position — at most min(k·|values|, m) rows, the
    * bounded at-rest form of the filter. At broadcastable sizes the
    * membership probe is a map-side broadcast join; past that the
    * probe degrades gracefully to a position-keyed shuffle join (a
    * sharded Bloom — each shuffle partition holds a slice of the bit
    * space), which is exactly how a 10⁹-member filter deploys. */
  def bloomBits(values: DataFrame, valueCol: String, k: Int, m: Long): DataFrame =
    values.select(explode(array((0 until k).map(i =>
        bloomPos(col(valueCol), i, m)): _*)).as("b"))
      .distinct()

  /** Membership probe: for each probe row, true iff ALL k positions of
    * `valueCol` are present in `bits`. No false negatives by
    * construction; false-positive rate ≈ fill^k (fill = set-bit
    * fraction). Output: (idCol, bloom_hit). */
  def bloomProbe(probe: DataFrame, idCol: String, valueCol: String,
      bits: DataFrame, k: Int, m: Long): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    probe.select(col(idCol), posexplode(array((0 until k).map(i =>
        bloomPos(col(valueCol), i, m)): _*)).as(Seq("_i", "b")))
      .join(broadcast(bits.withColumn("_set", lit(1))), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg((count(col("_set")) === k).as("bloom_hit"))
  }

  /** Bucket index of `value` in a `buckets`-wide uniform histogram over
    * [lo, hi], clamped to the edge buckets (values at/past `hi` land in
    * the last bucket). Deterministic float math in a FIXED operation
    * order — the oracle SQL side of the SAME operation chain comes from
    * [[histBucketSql]], so the two engines cannot drift. */
  def histBucket(value: Column, buckets: Int, lo: Double, hi: Double): Column =
    least(greatest(
        floor((value - lit(lo)) * lit(histScale(buckets, lo, hi))).cast("long"),
        lit(0L)),
      lit(buckets - 1L))

  /** The single precomputed scale both engines multiply by. Scala's
    * shortest-roundtrip Double printing reparses to the identical IEEE
    * value in DuckDB, so embedding THIS constant in the SQL reproduces
    * [[histBucket]]'s `(v - lo) * scale` operation order exactly —
    * previously the oracle wrote `* buckets / (hi-lo)` by hand, which
    * only coincided for the unit range. */
  private def histScale(buckets: Int, lo: Double, hi: Double): Double = {
    // Cross-engine exactness contract (round-9/10 advice): the scale is
    // a single embedded constant, but `(v - lo) * scale` only provably
    // matches across engines when the arithmetic introduces NO rounding
    // of its own — lo == 0 (the subtraction is the identity) and both
    // `buckets` and the range powers of two (the division is an exact
    // exponent shift). Every shipped gate satisfies this; a future
    // non-conforming gate must fail loudly HERE, not hash-diverge
    // silently in the driver's compare.
    val range = hi - lo
    def pow2(x: Double): Boolean =
      x > 0 && !x.isInfinite && x == math.scalb(1.0, math.getExponent(x))
    require(lo == 0.0 && pow2(range) && Integer.bitCount(buckets) == 1,
      s"histogram sketch needs lo=0, power-of-two range and buckets for " +
        s"exact cross-engine bucketing; got lo=$lo hi=$hi buckets=$buckets")
    buckets.toDouble / range
  }

  /** DuckDB fragment computing [[histBucket]] for `valueExpr` — same
    * constants, same operation order, generated not hand-kept-in-sync. */
  def histBucketSql(valueExpr: String, buckets: Int, lo: Double, hi: Double): String =
    s"LEAST(GREATEST(CAST(floor(($valueExpr - $lo) * " +
      s"${histScale(buckets, lo, hi)}) AS BIGINT), 0), ${buckets - 1})"

  /** DuckDB fragment for the bucket-midpoint quantile estimate — the
    * SQL twin of [[histQuantiles]]' `est_q` expression (same `lo +
    * (bucket + 0.5) * width` order, same 6-decimal rounding). */
  def histMidpointSql(bucketExpr: String, buckets: Int, lo: Double, hi: Double): String = {
    histScale(buckets, lo, hi) // same exactness contract, same loud failure
    s"ROUND($lo + (CAST($bucketExpr AS DOUBLE) + 0.5) * " +
      s"${(hi - lo) / buckets}, 6)"
  }

  /** Histogram QUANTILE sketch: per group, the per-bucket counts of a
    * bounded uniform histogram — at most `buckets` rows per group
    * whatever the input size, the bounded-state answer to percentiles
    * the way KMV is to COUNT(DISTINCT). Classic partial-aggregable (the
    * bucket counts combine map-side). Unlike GK/t-digest — whose merge
    * order perturbs the summary, making them impossible to oracle
    * bit-for-bit — the histogram is exact integer counts, so estimates
    * are deterministic across engines and partition layouts, with the
    * error bound traded for it being FIXED a priori: the q-quantile
    * estimate (bucket midpoint) sits within half a bucket width of an
    * exact order statistic (spec-asserted; the `t_quantile_sketch` gate
    * emits the measured error next to the estimate). */
  def histSketch(values: DataFrame, valueCol: String, groupCols: Seq[String],
      buckets: Int, lo: Double, hi: Double): DataFrame =
    values.groupBy(groupCols.map(col) :+
        histBucket(col(valueCol), buckets, lo, hi).as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a [[histSketch]]: for each percentile `p`
    * (integer, 0–100), the midpoint of the first bucket whose running
    * count reaches p% of the group — `100·cum ≥ p·n` is exact BIGINT
    * arithmetic, equivalent to `cum ≥ ceil(p·n/100)`, so the chosen
    * bucket CONTAINS the exact p-th order statistic and the midpoint
    * estimate is within half a bucket width of it. One window pass over
    * the (group × bucket)-sized sketch — never over the value stream. */
  def histQuantiles(sketch: DataFrame, groupCols: Seq[String], ps: Seq[Int],
      buckets: Int, lo: Double, hi: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val width = (hi - lo) / buckets
    sketch
      .withColumn("cum", sum(col("cnt")).over(w.rowsBetween(Long.MinValue, 0)))
      .withColumn("n_rows", sum(col("cnt")).over(wAll))
      .select(groupCols.map(col) :+ col("bucket") :+ col("cum") :+ col("n_rows") :+
        explode(array(ps.map(p => lit(p.toLong)): _*)).as("p"): _*)
      .filter(col("cum") * lit(100L) >= col("p") * col("n_rows"))
      .groupBy(groupCols.map(col) :+ col("p"): _*)
      .agg(max(col("n_rows")).as("n_docs"), min(col("bucket")).as("bucket"))
      .select(groupCols.map(col) :+ col("p") :+ col("n_docs") :+ col("bucket") :+
        round(lit(lo) + (col("bucket").cast("double") + lit(0.5)) * lit(width), 6)
          .as("est_q"): _*)
  }

  /** Point estimates for candidate values against a [[cmsSketch]]:
    * est(v) = min over hash rows of the bucket count — the CountMin
    * guarantee is est >= true count, with overestimate bounded by
    * collisions. The sketch is depth×width rows → broadcast; the
    * candidate set drives the plan (estimates are map-side after the
    * broadcast join, no shuffle over the value stream). */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame = {
    val passThrough = candidates.columns.map(col).toSeq
    candidates
      .select(passThrough :+ explode(array((0 until depth).map(i =>
        struct(lit(i).as("seed"),
          cmsBucket(col(valueCol), i, width).as("bucket"))): _*)).as("sb"): _*)
      .join(broadcast(sketch),
        col("sb.seed") === sketch("seed") && col("sb.bucket") === sketch("bucket"))
      .groupBy(passThrough: _*)
      .agg(min(col("cnt")).as("est"))
  }
}
