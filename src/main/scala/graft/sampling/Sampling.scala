package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/splitting for training-data
  * pipelines. RNG-based `df.sample` is neither reproducible across
  * engines nor stable under repartitioning; hashing the record id is —
  * every engine that agrees on md5 assigns every record to the same
  * bucket forever, which is exactly what train/val/test contamination
  * control needs at corpus scale. Map-only, codegen'd, no shuffle. */
object Sampling {

  /** First-`width`-hex-chars bucket of the id's md5 — 16^width uniform
    * buckets compared lexicographically (fixed-width lowercase hex, so
    * string order == numeric order in every engine). The single source
    * of the id-hashing convention: every sampler and every SQL oracle
    * must agree on cast-to-string → md5 → hex prefix. */
  private def hexBucket(id: Column, width: Int = 2): Column =
    substring(md5(id.cast("string").cast("binary")), 1, width)

  private def threshold(p: Double): String = {
    require(p >= 0 && p <= 1, s"fraction out of range: $p")
    // 256 would render as 3-char "100", which sorts BELOW 2-char hex —
    // fractions that round to all-of-the-space are handled by callers
    val b = math.round(p * 256).toInt
    require(b <= 255, s"fraction $p rounds to the whole hash space; use the unfiltered frame")
    f"$b%02x"
  }

  /** Keep a deterministic ~`fraction` of rows (granularity 1/256). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    if (math.round(fraction * 256) >= 256) df
    else df.filter(hexBucket(col(idCol)) < lit(threshold(fraction)))

  /** Stratified deterministic sampling: a per-stratum keep rate (data
    * mixing — downsample the dominant source/language, keep the rare
    * one whole). Same md5-bucket mechanics as [[hashSample]], so the
    * kept set is reproducible across engines and stable under
    * repartitioning; map-only, no shuffle, no RNG. Strata not listed in
    * `rates` fall back to `defaultRate`. */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    def keep(r: Double): Column =
      if (math.round(r * 256) >= 256) lit(true)
      else hexBucket(col(idCol)) < lit(threshold(r))
    df.filter(stratumDispatch(strataCol,
      rates.map { case (s, r) => s -> keep(r) }, keep(defaultRate)))
  }

  /** Add a `split` column: 'test' for the first ~testPct of hash space,
    * 'val' for the next ~valPct, 'train' for the rest. Disjoint and
    * exhaustive by construction; membership depends only on the id. */
  def deterministicSplit(df: DataFrame, idCol: String,
      testPct: Double, valPct: Double): DataFrame = {
    require(math.round((testPct + valPct) * 256) <= 255,
      s"test ($testPct) + val ($valPct) must leave at least 1/256 of the hash space for train")
    val b = hexBucket(col(idCol))
    df.withColumn("split",
      when(b < lit(threshold(testPct)), "test")
        .when(b < lit(threshold(testPct + valPct)), "val")
        .otherwise("train"))
  }

  /** Importance sampling with a PER-ROW keep probability: keep a row iff
    * its id's hash bucket falls below `weight` (a column in [0,1] — a
    * quality score, a perplexity-derived rate). Granularity 1/256 via
    * floor(weight·256) for weights below 1; weight ≥ 1 keeps the row
    * UNCONDITIONALLY (the [[hashSample]] whole-space escape — without
    * it the 255/256 rendering clamp would silently drop the ~1/256 of
    * rows whose bucket is 'ff' from strata that promised to keep
    * everything). Out-of-domain weights degrade safely: negative or
    * NULL weights keep NOTHING (unclamped, a negative int renders as
    * two's-complement 'ffffffxx' and would silently keep EVERYTHING —
    * and a NULL ≥ 1 disjunct is NULL, which filters). Map-only, no
    * RNG: the kept set is a pure function of (id, weight),
    * reproducible across engines and stable under repartitioning.
    *
    * Caller contract at the keep-all boundary (round-15 advice): the
    * escape is an EXACT `>= 1.0` compare, so the keep-rate is
    * discontinuous there — weight 255/256 ≈ 0.9961 keeps 255/256 of
    * rows while 0.99999999 still keeps 255/256 (floor quantization)
    * and exactly 1.0 keeps ALL. A weight INTENDED as "keep all" must
    * therefore still compare ≥ 1.0 after whatever floating-point
    * arithmetic produced it — derive it as `LEAST(1.0, x)` with x
    * computed so the keep-all branch lands on the literal, not on
    * 1 − ε. This is deliberate: a tolerance band below 1.0 would make
    * "keeps everything" depend on ε conventions that no SQL oracle
    * replays exactly. */
  def weightedHashSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    // clamp in LONG space BEFORE the int cast: floor() of an extreme
    // negative weight is a Long whose 32-bit truncation can wrap
    // positive (e.g. floor(w*256) = -4294967041 casts to int 255 =
    // keep-everything) — the exact hole the clamp exists to close
    df.filter(weight >= 1.0 || hexBucket(col(idCol)) <
      format_string("%02x", greatest(lit(0L),
        least(lit(255L), coalesce(floor(weight * 256), lit(0L)))).cast("int")))

  /** Per-stratum dispatch shared by [[stratifiedHashSample]] and
    * [[mixToTarget]]: route each row to its stratum's keep predicate. */
  private def stratumDispatch(strataCol: String, keep: Map[String, Column],
      default: Column): Column =
    keep.toSeq.sortBy(_._1).foldRight(default) {
      case ((stratum, k), rest) => when(col(strataCol) === stratum, k).otherwise(rest)
    }

  /** Rebalance a corpus to a target per-stratum mixture — the data-mixing
    * stage that downsamples over-represented languages/sources to hit a
    * prescribed recipe (e.g. 40% en / 15% each of de,es,fr,zh).
    *
    * `targetPct` maps each stratum to its integer share (must sum to
    * 100). The largest corpus the recipe can serve is M = min_l(n_l ·
    * 100 ÷ t_l); each stratum keeps k_l = t_l · M ÷ 100 rows via the
    * hash-bucket threshold b_l = 65536 · k_l ÷ n_l (4 hex chars — fine
    * enough that a stratum over-represented up to 65536× vs its share
    * still keeps rows; beyond that b_l floors to 0 and the require
    * fails LOUDLY rather than silently emptying the stratum). ALL of
    * that is integer arithmetic (floor division) — no float rounding to
    * drift between engines — so a SQL oracle can replicate the kept set
    * exactly. Strata absent from `targetPct` are dropped (share 0).
    *
    * The per-stratum counts are a dimension-sized aggregate (strata ≪
    * corpus); the no-counts overload collects them with one extra
    * aggregate pass — callers that already have the counts (a corpus
    * report, a prior stage) should pass them through. One map-only
    * filter pass either way; at 100 TB both are scan-bound. Hash
    * granularity 1/65536 makes kept counts approximate (binomial
    * around k_l); the recipe's RATIOS converge at corpus scale. */
  def mixToTarget(df: DataFrame, idCol: String, strataCol: String,
      targetPct: Map[String, Int]): DataFrame =
    mixToTarget(df, idCol, strataCol, targetPct,
      df.groupBy(col(strataCol)).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)

  /** Temperature-flattened domain rebalance at T = 2 (keep ∝ √n_l) —
    * the exponent-smoothed sampling of the multilingual-LM recipes
    * (sample languages ∝ n^α, α = 1/T), pinned at α = ½: the one
    * non-trivial exponent whose arithmetic is cross-engine
    * deterministic, because keep counts come from an EXACT integer
    * square root (k_l = ⌊√(n_min · n_l)⌋ via BigInteger.sqrt — no
    * floating point at all on the Scala side; the SQL oracle corrects
    * its double-sqrt candidate by one integer-arithmetic step, making
    * it exact for ANY product that fits a BIGINT — see tempMixSql —
    * so no count-magnitude assumption is load-bearing anywhere;
    * general α needs pow, whose last-ulp rounding differs between
    * libm implementations, so a portable oracle is impossible at the
    * floor boundaries).
    *
    * Scaling: C = √n_min makes the SMALLEST stratum keep itself whole
    * (k_min = n_min) and every larger stratum downsample toward
    * sqrt-proportionality — pure flattening, no upsampling. Thresholds
    * then follow the [[mixToTarget]] machinery: b_l = 65536·k_l ÷ n_l,
    * 4-hex-char md5 bucket compare, all integer floor division.
    * Map-only filter pass; counts are the dimension-sized aggregate. */
  def mixToSqrtTemperature(df: DataFrame, idCol: String, strataCol: String,
      counts: Map[String, Long]): DataFrame = {
    require(counts.nonEmpty, "mixToSqrtTemperature needs at least one stratum")
    counts.foreach { case (s, n) =>
      require(n > 0L, s"stratum '$s' has a non-positive count: $n") }
    val nMin = counts.values.min
    val keep = counts.map { case (stratum, n) =>
      val k = java.math.BigInteger.valueOf(nMin)
        .multiply(java.math.BigInteger.valueOf(n)).sqrt().longValueExact()
      val b = 65536L * k / n
      // same loud-failure contract as mixToTarget: a threshold that
      // floors to zero would silently EMPTY the stratum (reachable only
      // past ~2^32-fold skew vs the smallest stratum, but the two
      // mixers must agree on the failure mode)
      require(b > 0L, s"stratum '$stratum' is over-represented beyond " +
        s"the 1/65536 sampling grain (n=$n, n_min=$nMin) — its threshold " +
        "floors to zero; rebalance in stages or coarsen the strata")
      stratum -> (
        if (b >= 65536L) lit(true)
        else hexBucket(col(idCol), 4) < lit(f"$b%04x"))
    }
    df.filter(stratumDispatch(strataCol, keep, lit(false)))
  }

  /** [[mixToTarget]] with the per-stratum row counts supplied by the
    * caller (they must be the df's true counts — thresholds derive from
    * them). */
  def mixToTarget(df: DataFrame, idCol: String, strataCol: String,
      targetPct: Map[String, Int], counts: Map[String, Long]): DataFrame = {
    require(targetPct.values.sum == 100, s"target shares must sum to 100: $targetPct")
    require(targetPct.values.forall(_ > 0), s"target shares must be positive: $targetPct")
    targetPct.keys.foreach { s =>
      require(counts.getOrElse(s, 0L) > 0L,
        s"stratum '$s' has a target share but no rows (count: ${counts.getOrElse(s, 0L)})")
    }
    val m = targetPct.map { case (s, t) => counts(s) * 100L / t }.min
    val buckets = targetPct.map { case (s, t) =>
      val kept = t * m / 100L
      s -> (65536L * kept / counts(s))
    }
    buckets.foreach { case (s, b) =>
      require(b > 0L, s"stratum '$s' is over-represented beyond the " +
        s"1/65536 sampling grain (n=${counts(s)}, target ${targetPct(s)}%, M=$m) — " +
        "its threshold floors to zero; rebalance in stages or coarsen the recipe")
    }
    val keep = buckets.map { case (stratum, b) =>
      stratum -> (
        if (b >= 65536L) lit(true)
        else hexBucket(col(idCol), 4) < lit(f"$b%04x"))
    }
    df.filter(stratumDispatch(strataCol, keep, lit(false)))
  }

  /** Epoch upsampling — mixing WITH REPETITION: each row is replicated
    * `epochsCol` times with an `epoch` index in [1, epochs], the
    * up-sample-high-quality-sources stage of the published LLM data
    * recipes (a source or quality tier "seen for N epochs" is exactly
    * N replicas of its rows in the assembled corpus; downstream shuffle
    * ranking then interleaves the replicas deterministically).
    *
    * `epochsCol` must be a deterministic positive int expression
    * (a quality-tier CASE, a per-source lookup) — the replication is a
    * 1→N generator (`explode(sequence(1, epochs))`), map-only, no
    * shuffle, so at 100 TB the cost is the extra rows themselves, and
    * those flow straight into the bucketed pack prefix without ever
    * materializing per-doc copies of the TEXT (callers carry doc_id +
    * token counts through the expansion, not payloads — the packed
    * manifest references each document by id, the storage layer
    * dedupes). All carried columns pass through unchanged. */
  def epochUpsample(df: DataFrame, epochsCol: Column): DataFrame =
    df.withColumn("epoch", explode(sequence(lit(1), epochsCol)))
}
