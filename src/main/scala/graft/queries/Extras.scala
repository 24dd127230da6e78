package graft.queries

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact mean via a typed [[Aggregator]] (the UDAF surface): the buffer
  * keeps an exact integer-valued sum + count, merge is associative, and
  * the final division is a single IEEE op → cross-engine deterministic. */
object ExactAvgAggregator extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + a, b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Long)): Double = r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Extras {

  /** Custom UDAF in a grouped aggregation, registered for SQL use too. */
  def udafAvg(s: SparkSession, dir: String): DataFrame = {
    s.udf.register("exact_avg", udaf(ExactAvgAggregator))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("exact_avg(l_quantity)").as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val udafAvgSql: String =
    """SELECT l_returnflag, SUM(l_quantity) / COUNT(*) AS avg_qty, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Array aggregation: per-supplier sorted order-key lists (collect_list
    * order is nondeterministic → sort_array canonicalizes). */
  def arrayAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 3)
      .groupBy(col("l_suppkey"))
      .agg(sort_array(collect_list(col("l_orderkey"))).as("orderkeys"),
        size(collect_list(col("l_orderkey"))).cast("long").as("n_items"))
      .orderBy(col("l_suppkey"))

  val arrayAggSql: String =
    """SELECT l_suppkey, list(l_orderkey ORDER BY l_orderkey) AS orderkeys,
      |  COUNT(*) AS n_items
      |FROM lineitem WHERE l_suppkey <= 3
      |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin
}
