package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-past) join: for every left row, the single right row
  * with the greatest right timestamp ≤ the left timestamp, per key — the
  * time-series "latest state at event time" primitive (market data,
  * feature lookup, checkpoint attribution).
  *
  * Spark has no native ASOF JOIN; the composition here is the canonical
  * union + ordered-window formulation: tag both sides, union, and take
  * `last(value, ignoreNulls)` over (key ORDER BY ts, side ROWS UNBOUNDED
  * PRECEDING..CURRENT). Right rows sort before left rows at equal ts, so
  * the match is inclusive (right.ts == left.ts matches), like DuckDB's
  * ASOF JOIN which oracles the gate query.
  *
  * Scale shape: ONE shuffle of |L|+|R| rows on the key and a
  * per-partition sort — strictly cheaper than the range-join quadratic
  * fallback Spark would plan for `l JOIN r ON key AND r.ts <= l.ts` +
  * window dedup, and no driver-side anything. Skewed keys behave like
  * any windowed aggregation (AQE/salting apply unchanged).
  */
object AsOfJoin {

  /** @param pick right-side columns to carry to the matched left rows,
    *             emitted as `asof_<name>` (null when no right row is ≤).
    * Left/right may share column names; only `key`/`ts` must exist in
    * both. Right rows should be unique per (key, ts) — with ties the
    * row with the greatest `pick` head value wins deterministically. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      pick: Seq[String]): DataFrame = {
    require(pick.nonEmpty, "pick at least one right-side column")
    val leftCols = left.columns.toSeq
    val picked = pick.map(c => s"asof_$c")
    // shared layout: left cols ++ picked cols ++ side tag
    val l = pick.foldLeft(left)((df, c) =>
      df.withColumn(s"asof_$c", lit(null).cast(right.schema(c).dataType)))
      .withColumn("_side", lit(1))
    val r0 = right.select((Seq(col(key), col(ts)) ++
      pick.map(c => col(c).as(s"asof_$c"))): _*)
    val r = leftCols.filterNot(Set(key, ts)).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("_side", lit(0))
      .select((leftCols.map(col) ++ picked.map(col) :+ col("_side")): _*)
    val unioned = l.select((leftCols.map(col) ++ picked.map(col) :+ col("_side")): _*)
      .unionByName(r)
    // right-before-left at equal ts (inclusive match); deterministic
    // tie-break among equal right timestamps via the first picked column
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc, col(picked.head).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = picked.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    matched.filter(col("_side") === 1).select(leftCols.map(col) ++ picked.map(col): _*)
  }
}
