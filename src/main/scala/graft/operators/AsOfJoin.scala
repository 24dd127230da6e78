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

  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => orderable(f.dataType))
      case ArrayType(e, _) => orderable(e)
      case _ => true
    }
  }

  /** @param pick right-side columns to carry to the matched left rows,
    *             emitted as `asof_<name>` (all null when no right row
    *             is ≤). The matched row is carried ATOMICALLY — all
    *             picked columns come from the SAME right row, and a
    *             null value inside the matched row stays null (it is
    *             never "repaired" from an earlier row).
    * Left/right may share column names; only `key`/`ts` must exist in
    * both. With several right rows at the same (key, ts), the greatest
    * picked tuple wins deterministically. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      pick: Seq[String]): DataFrame = {
    require(pick.nonEmpty, "pick at least one right-side column")
    val leftCols = left.columns.toSeq
    // the whole picked row travels as ONE struct, so last(ignoreNulls)
    // selects a row, not per-column values from different rows
    val r0 = right.select(col(key), col(ts),
      struct(pick.map(col): _*).as("_m"))
    val mType = r0.schema("_m").dataType
    val l = left.withColumn("_m", lit(null).cast(mType)).withColumn("_side", lit(1))
    val r = leftCols.filterNot(Set(key, ts)).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("_side", lit(0))
    val shared = leftCols.map(col) ++ Seq(col("_m"), col("_side"))
    val unioned = l.select(shared: _*).unionByName(r.select(shared: _*))
    // right-before-left at equal ts (inclusive match); among equal right
    // timestamps the struct ordering makes the greatest picked tuple win.
    // A struct containing an unorderable type (map) can't join the sort
    // key — the match is then still atomic but tie choice is arbitrary.
    val tieBreak =
      if (orderable(mType)) Seq(col("_m").asc_nulls_first) else Nil
    val w = Window.partitionBy(col(key))
      .orderBy(Seq(col(ts).asc, col("_side").asc) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned.withColumn("_m", last(col("_m"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        pick.map(c => col("_m").getField(c).as(s"asof_$c")): _*)
  }
}
