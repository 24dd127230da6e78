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

  /** First-two-hex-chars bucket of the id's md5 — 256 uniform buckets
    * compared lexicographically (fixed-width lowercase hex, so string
    * order == numeric order in every engine). */
  private def hexBucket(id: Column): Column =
    substring(md5(id.cast("string").cast("binary")), 1, 2)

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
    val cond = rates.toSeq.sortBy(_._1).foldRight(keep(defaultRate)) {
      case ((stratum, r), rest) => when(col(strataCol) === stratum, keep(r)).otherwise(rest)
    }
    df.filter(cond)
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
    * floor(weight·256), capped at 255/256 so weight=1.0 keeps ~255/256
    * of rows (the cap keeps the comparison inside 2-hex-char space; pass
    * weight ≥ 1 rows around the sampler if they must be kept whole).
    * Map-only, no RNG: the kept set is a pure function of (id, weight),
    * reproducible across engines and stable under repartitioning. */
  def weightedHashSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.filter(hexBucket(col(idCol)) <
      format_string("%02x", least(lit(255), floor(weight * 256).cast("int"))))

  /** Rebalance a corpus to a target per-stratum mixture — the data-mixing
    * stage that downsamples over-represented languages/sources to hit a
    * prescribed recipe (e.g. 40% en / 15% each of de,es,fr,zh).
    *
    * `targetPct` maps each stratum to its integer share (must sum to
    * 100). The largest corpus the recipe can serve is M = min_l(n_l ·
    * 100 ÷ t_l); each stratum keeps k_l = t_l · M ÷ 100 rows via the
    * hash-bucket threshold b_l = 256 · k_l ÷ n_l. ALL of that is integer
    * arithmetic (floor division) — no float rounding to drift between
    * engines — so a SQL oracle can replicate the kept set exactly.
    * Strata absent from `targetPct` are dropped (share 0).
    *
    * The per-stratum counts are a dimension-sized aggregate (strata ≪
    * corpus) collected to the driver to build the filter predicate —
    * the same cardinality class as a broadcast dimension. One count
    * pass + one map-only filter pass; at 100 TB both are scan-bound.
    * Hash granularity 1/256 makes kept counts approximate (±n_l/256 of
    * k_l); the recipe's RATIOS converge at corpus scale. */
  def mixToTarget(df: DataFrame, idCol: String, strataCol: String,
      targetPct: Map[String, Int]): DataFrame = {
    require(targetPct.values.sum == 100, s"target shares must sum to 100: $targetPct")
    require(targetPct.values.forall(_ > 0), s"target shares must be positive: $targetPct")
    val counts = df.groupBy(col(strataCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    targetPct.keys.foreach { s =>
      require(counts.contains(s), s"stratum '$s' has a target share but no rows")
    }
    val m = targetPct.map { case (s, t) => counts(s) * 100L / t }.min
    val buckets = targetPct.map { case (s, t) =>
      val kept = t * m / 100L
      s -> (256L * kept / counts(s))
    }
    val cond = buckets.toSeq.sortBy(_._1).foldRight(lit(false)) {
      case ((stratum, b), rest) =>
        val keep =
          if (b >= 256L) lit(true)
          else if (b <= 0L) lit(false)
          else hexBucket(col(idCol)) < lit(f"$b%02x")
        when(col(strataCol) === stratum, keep).otherwise(rest)
    }
    df.filter(cond)
  }
}
