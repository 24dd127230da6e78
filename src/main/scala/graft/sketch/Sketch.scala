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
    * double range. Spark-side this is the codegen'd
    * [[org.apache.spark.sql.graft.Hash60]] expression — identical
    * values to `conv(substring(md5(cast(v as binary)), 1, 15), 16, 10)`
    * (Hash60Spec pins the equality) without the hex-string
    * materialization + base-16 parse, which dominated every gate that
    * hashes per token/gram. */
  def hash60(c: Column): Column =
    org.apache.spark.sql.graft.Hash60.hash60(c)

  /** The builtin-composition formulation of [[hash60]] — value-equality
    * reference for the codegen expression in specs. */
  private[graft] def hash60Builtin(c: Column): Column =
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
    org.apache.spark.sql.graft.Hash60.hash60Seeded(c, seed) % width

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

  /** [[cmsSketch]] from PRE-COUNTED values: `counts` carries one row
    * per distinct value with its occurrence count, and per-bucket
    * counts are Σ of member counts — exact integer equality with
    * hashing every occurrence, but the depth md5 rows are paid per
    * DISTINCT value instead of per occurrence (round-19 optimization:
    * a batch gate that already aggregates exact counts for its
    * candidate stage hashes 3×|occurrences| redundantly — at corpus
    * scale occurrences outnumber distincts by 10³+). The streaming
    * twin keeps the per-occurrence form: there the sketch IS the
    * bounded state and a per-value pre-count would hold unbounded
    * per-distinct state. */
  def cmsSketchFromCounts(counts: DataFrame, valueCol: String,
      cntCol: String, depth: Int, width: Int): DataFrame =
    counts.select(col(cntCol).as("_n"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("seed"),
          cmsBucket(col(valueCol), i, width).as("bucket"))): _*)).as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(sum(col("_n")).as("cnt"))

  // ------------------------------------------------------- HyperLogLog

  /** HLL register count (2^8) and the cap on observable rank. */
  val HllM = 256
  val HllRankCap = 50

  /** α_m · m² · 2^50 for m = 256 — the whole numerator of the raw HLL
    * estimate precomputed as ONE double literal (the histScale
    * discipline: a single constant embedded in both engines keeps the
    * estimate one IEEE division of an exact-integer denominator). */
  val HllNumerator: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * math.pow(2.0, 50)

  /** HLL register index of a value: first 2 md5 hex chars (8 bits). */
  def hllRegister(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 2), 16, 10).cast("int")

  /** HLL rank of a value: leading-zero count of the NEXT 60 hash bits
    * plus one, capped at [[HllRankCap]] — computed by HEX-STRING
    * arithmetic (count leading '0' chars = 4 zero bits each, then a
    * 16-way lookup on the first non-zero char), which both engines
    * reproduce exactly; no floating log2, no bit-length builtin. */
  def hllRank(c: Column): Column = {
    val tail = substring(md5(c.cast("binary")), 3, 15)
    val lz = length(regexp_extract(tail, "^0*", 0))
    val first = substring(regexp_replace(tail, "^0*", ""), 1, 1)
    val extra = when(first === "1", 3)
      .when(first.isin("2", "3"), 2)
      .when(first.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    least(lz * 4 + extra + 1, lit(HllRankCap))
  }

  /** Per-group HLL estimate over `valueCol` (Flajolet–Fuss–Gandouet–
    * Meunier 2007): registers are max-rank per (group, register) —
    * INSERT-IDEMPOTENT integer state, m rows per group at ANY input
    * size — and the estimate is deterministic cross-engine because the
    * harmonic sum is the exact BIGINT Σ 2^(50−Mⱼ) (register updates
    * are max → order-invariant; missing registers count as rank 0).
    * Small-range (raw ≤ 2.5m with empty registers) switches to linear
    * counting m·ln(m/V) — one ln of an exactly-represented ratio,
    * rounded 4dp (the repo's quantized-double convention).
    * Output: (groupCols..., n_zero_regs, harmonic_s, est). */
  def hllEstimate(values: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    // fused register+rank: ONE md5 digest per occurrence (round-20
    // optimization, [[org.apache.spark.sql.graft.HllRegRank]]) instead
    // of two digests + a hex-string regex rank; value-identical
    // (HllRegRankSpec), so the hex-chain oracle SQL is unchanged
    val regs = values
      .select(g :+ org.apache.spark.sql.graft.HllRegRank
        .hll_reg_rank(col(valueCol)).as("_rr"): _*)
      .groupBy(g :+ col("_rr.r").as("_r"): _*)
      .agg(max(col("_rr.rank")).as("_rank"))
    val allRegs = values.select(g: _*).distinct()
      .select(g :+ explode(sequence(lit(0), lit(HllM - 1))).as("_r"): _*)
    val filled = allRegs.join(regs, groupCols :+ "_r", "left")
      .select(g :+ coalesce(col("_rank"), lit(0)).as("_rank"): _*)
    filled
      .groupBy(g: _*)
      .agg(
        sum(when(col("_rank") === 0, 1L).otherwise(0L)).as("n_zero_regs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRankCap - _rank)"))
          .as("harmonic_s"))
      .withColumn("_raw", lit(HllNumerator) / col("harmonic_s").cast("double"))
      .withColumn("est", round(
        when(col("_raw") <= 2.5 * HllM && col("n_zero_regs") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("n_zero_regs").cast("double")))
          .otherwise(col("_raw")), 4))
      .drop("_raw")
  }

  /** DuckDB twin of the [[hllRegister]]/[[hllRank]]/[[hllEstimate]]
    * chain for a value expression `v` grouped by `groupExpr` over
    * `fromClause` — generated, not hand-kept-in-sync. */
  def hllEstimateSql(groupExpr: String, v: String, fromClause: String): String = {
    val cap = HllRankCap
    s"""hx AS (SELECT $groupExpr AS g, md5($v) AS h FROM $fromClause),
       |rr AS (SELECT g,
       |  CAST('0x' || substr(h, 1, 2) AS BIGINT) AS r,
       |  LEAST(4 * length(regexp_extract(substr(h, 3, 15), '^0*'))
       |    + (CASE substr(regexp_replace(substr(h, 3, 15), '^0*', ''), 1, 1)
       |       WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |       WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
       |       ELSE 0 END) + 1, $cap) AS rank
       |  FROM hx),
       |mx AS (SELECT g, r, MAX(rank) AS mr FROM rr GROUP BY 1, 2),
       |fill AS (SELECT grid.g, grid.r, COALESCE(mx.mr, 0) AS mr
       |         FROM (SELECT g, unnest(generate_series(0, ${HllM - 1})) AS r
       |               FROM (SELECT DISTINCT g FROM rr)) grid
       |         LEFT JOIN mx ON mx.g = grid.g AND mx.r = grid.r),
       |hll AS (SELECT g,
       |  CAST(SUM(CASE WHEN mr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_regs,
       |  CAST(SUM(1::BIGINT << ($cap - mr)) AS BIGINT) AS harmonic_s
       |  FROM fill GROUP BY 1),
       |est AS (SELECT g, n_zero_regs, harmonic_s,
       |  ROUND(CASE WHEN $HllNumerator / CAST(harmonic_s AS DOUBLE) <= ${2.5 * HllM}
       |              AND n_zero_regs > 0
       |         THEN ${HllM.toDouble} * LN(${HllM.toDouble} / CAST(n_zero_regs AS DOUBLE))
       |         ELSE $HllNumerator / CAST(harmonic_s AS DOUBLE) END, 4) AS est
       |  FROM hll)""".stripMargin
  }

  /** Bloom bit position of `value` under hash row `seed`:
    * hash60(seed || '|' || v) mod m — [[cmsBucket]] widened to a Long
    * modulus (a production Bloom over 10⁹ members needs m ≈ 8·10⁹
    * positions, past Int). Non-negative, engine-portable. */
  def bloomPos(c: Column, seed: Int, m: Long): Column =
    org.apache.spark.sql.graft.Hash60.hash60Seeded(c, seed) % m

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

  /** Largest set-bit table (rows, one long each) we will force into a
    * driver-built broadcast relation: 32M positions ≈ a few hundred MiB
    * hashed relation — safely inside a 24g driver, far past the point
    * where a shuffle join would win anyway. Past this the probe joins
    * WITHOUT a hint, so the planner (AQE included) picks a
    * position-keyed shuffle join — the sharded-Bloom deployment shape
    * for 10⁹-member filters, where each shuffle partition holds a
    * slice of the bit space. */
  private[graft] val BloomBroadcastMaxBits: Long = 32L << 20

  /** Largest Bloom size (bits of m) we will densify into a driver-held
    * bitmap for the map-side [[org.apache.spark.sql.graft.BloomHitExpr]]
    * probe: 2²⁸ bits = 32 MiB of longs — at 8 bits/member that covers a
    * 33M-member filter (any real benchmark suite by orders of
    * magnitude), collected as ≤ 4M (word, or-mask) rows. Past this the
    * probe keeps the position-keyed join path ([[bloomHint]] then
    * decides broadcast vs sharded shuffle join) — the 10⁹-member
    * deployment shape is unchanged. */
  private[graft] val BloomBitmapMaxBits: Long = 1L << 28

  /** Densify a set-bit table into the bitmap [[BloomHitExpr]] probes:
    * word w holds bit (b % 64) for every set position b with
    * b / 64 == w. The OR-fold runs distributed (≤ m/64 rows reach the
    * driver); only call under [[BloomBitmapMaxBits]]. */
  private[graft] def bloomBitmap(bits: DataFrame, m: Long): Array[Long] = {
    require(m <= BloomBitmapMaxBits, s"bloom bitmap past cap: $m")
    val words = new Array[Long](((m + 63) / 64).toInt)
    bits
      .select(expr("CAST(b DIV 64 AS BIGINT)").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(b % 64 AS INT))").as("mask"))
      .groupBy(col("w")).agg(expr("bit_or(mask)").as("mm"))
      .collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Largest STRING-keyed row count we will force into a broadcast
    * build. Separate from [[BloomBroadcastMaxBits]] deliberately: that
    * constant was calibrated for 8-byte long bit positions, and 32M
    * variable-length grams (tens of bytes each, plus hashed-relation
    * overhead) would be a multi-GB build just under that gate. 4M
    * string rows ≈ a few hundred MiB — the same envelope the bit
    * bound documents. */
  private[graft] val StringBroadcastMaxRows: Long = 4L << 20

  /** Hint `bits` into a broadcast only when its row bound fits
    * [[BloomBroadcastMaxBits]]; otherwise return it unhinted so the
    * planner chooses. `expectedBits` is an UPPER BOUND on set rows
    * (min(k·members, m) when the member count is known, else m). */
  private[graft] def bloomHint(bits: DataFrame, expectedBits: Long): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    if (expectedBits <= BloomBroadcastMaxBits) broadcast(bits) else bits
  }

  /** Membership probe: for each probe row, true iff ALL k positions of
    * `valueCol` are present in `bits`. No false negatives by
    * construction; false-positive rate ≈ fill^k (fill = set-bit
    * fraction). Output: (idCol, bloom_hit).
    *
    * `expectedMembers` (when ≥ 0) bounds the set rows at
    * min(k·members, m) to decide the broadcast hint; unknown (−1)
    * falls back to the loose bound m. Either way the hint is GATED on
    * [[BloomBroadcastMaxBits]] — a 10⁹-member filter probes through a
    * position-keyed shuffle join, never a driver-side broadcast. */
  def bloomProbe(probe: DataFrame, idCol: String, valueCol: String,
      bits: DataFrame, k: Int, m: Long, expectedMembers: Long = -1L): DataFrame = {
    val bound = if (expectedMembers >= 0L) math.min(k.toLong * expectedMembers, m) else m
    probe.select(col(idCol), posexplode(array((0 until k).map(i =>
        bloomPos(col(valueCol), i, m)): _*)).as(Seq("_i", "b")))
      .join(bloomHint(bits.withColumn("_set", lit(1)), bound), Seq("b"), "left")
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
