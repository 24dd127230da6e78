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
    * order is nondeterministic → sort_array canonicalizes). The array is
    * then serialized to a joined string: the driver's comparer can't sort
    * or hash a list column (pandas "unhashable type" crash), and the string
    * form is value-identical information. */
  def arrayAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 3)
      .groupBy(col("l_suppkey"))
      .agg(concat_ws(",", sort_array(collect_list(col("l_orderkey")))).as("orderkeys"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_suppkey"))

  val arrayAggSql: String =
    """SELECT l_suppkey,
      |  array_to_string(list(l_orderkey ORDER BY l_orderkey), ',') AS orderkeys,
      |  COUNT(*) AS n_items
      |FROM lineitem WHERE l_suppkey <= 3
      |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** CUBE over two dimensions — all four grouping sets in one pass. */
  def cube2(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  val cube2Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** GROUPING SETS — the general multi-grouping aggregation (the sets
    * {(returnflag), (linestatus)} are expressible as neither rollup nor
    * cube). SQL surface: registered view + spark.sql; one Expand + one
    * aggregation underneath, same as cube/rollup. */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Exact interpolated percentiles per group (Spark `percentile` vs
    * DuckDB `quantile_cont` share the linear-interpolation definition;
    * round(6) absorbs their differing-but-equivalent IEEE orderings). */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val percentilesSql: String =
    """SELECT o_orderstatus,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** LIKE / IN predicates (both push to the parquet scan) + agg. */
  def likeIn(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_name").like("%gear%") &&
        col("p_type").isin("ECONOMY", "SMALL"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_parts"),
        // Exact decimal SUM → one IEEE conversion: avoids decimal
        // trailing-zero drift vs DuckDB's DECIMAL(38,x) in the driver hash.
        sum(col("p_retailprice").cast("decimal(12,2)")).cast("double").as("total_price"))
      .orderBy(col("p_type"))

  val likeInSql: String =
    """SELECT p_type, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM part WHERE p_name LIKE '%gear%' AND p_type IN ('ECONOMY','SMALL')
      |GROUP BY p_type ORDER BY p_type""".stripMargin

  /** IN-subquery (planned as semi join): orders of the 50 richest
    * customers. */
  def inSubquery(s: SparkSession, dir: String): DataFrame = {
    val rich = Tables.customer(s, dir)
      .orderBy(desc("c_acctbal"), asc("c_custkey")).limit(50)
      .select(col("c_custkey"))
    Tables.orders(s, dir)
      .join(broadcast(rich), col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
      .orderBy(col("o_orderstatus"))
  }

  val inSubquerySql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 50)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Date arithmetic: shipping-delay buckets (all integer day math). */
  def dateArith(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(s, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .groupBy(expr("delay_days div 30").as("delay_month")) // integer div: `/` would round-vs-truncate differently across engines
      .agg(count(lit(1)).as("n_items"),
        min(col("delay_days")).as("min_delay"),
        max(col("delay_days")).as("max_delay"))
      .orderBy(col("delay_month"))
  }

  val dateArithSql: String =
    """SELECT CAST(DATEDIFF('day', o_orderdate, l_shipdate) AS BIGINT) // 30 AS delay_month,
      |  COUNT(*) AS n_items,
      |  MIN(CAST(DATEDIFF('day', o_orderdate, l_shipdate) AS BIGINT)) AS min_delay,
      |  MAX(CAST(DATEDIFF('day', o_orderdate, l_shipdate) AS BIGINT)) AS max_delay
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
