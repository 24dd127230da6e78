package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Relational query surface (the capabilities the reference inherits from
  * Spark itself — SURVEY.md §2.2): scans, filter/project, joins (shuffle,
  * broadcast, semi/anti), aggregation, window, sort/limit, set ops,
  * distinct, rollup, subqueries.
  *
  * Determinism rules for the DuckDB oracle hash-compare:
  *  - money columns are exactly 2-decimal in the data → cast to
  *    DecimalType before aggregating (exact, order-independent arithmetic
  *    in both engines); never hash a large double accumulation.
  *  - doubles in output only when the computation is a single IEEE op on
  *    exact inputs (e.g. exact_sum / count).
  *  - top-k always has a unique deterministic tie-break key.
  */
object Relational {

  private val dec2  = DecimalType(12, 2)
  private val disc2 = DecimalType(4, 2)

  /** price * (1 - discount) in exact decimal arithmetic. */
  private def discPrice: Column =
    col("l_extendedprice").cast(dec2) *
      (lit(1).cast(disc2) - col("l_discount").cast(disc2))

  /** TPC-H Q1 flavor: scan-heavy group-agg with exact decimal sums.
    * Scale: single shuffle on a low-cardinality key; partial aggregation
    * (map-side combine) does almost all the work before the exchange. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast(dec2)).as("sum_base_price"),
        sum(discPrice).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_base_price,
      |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS sum_disc_price,
      |  SUM(l_quantity) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 flavor: 3-way join + agg + deterministic top-k.
    * Scale: customer is the small side → broadcast; orders⋈lineitem is the
    * big shuffle join on the join key; AQE handles skew. */
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast(TimestampType))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(discPrice).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate,
      |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Window functions: top-3 shipments per supplier by recency, with a
    * running quantity. Unique (shipdate, orderkey, linenumber) order key
    * keeps row_number deterministic.
    * Scale: one shuffle on l_suppkey; window sort is per-partition. */
  def q6Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(desc("l_shipdate"), asc("l_orderkey"), asc("l_linenumber"))
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("rn"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val q6Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, rn, running_qty FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate DESC, l_orderkey, l_linenumber) AS rn,
      |    SUM(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate DESC, l_orderkey, l_linenumber
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      |  FROM lineitem) t
      |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin
}
