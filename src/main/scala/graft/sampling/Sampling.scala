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
}
