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
        // exact decimal SUMs, one IEEE conversion at the end — immune to
        // decimal trailing-zero drift in the oracle hash at ANY sf
        sum(col("l_extendedprice").cast(dec2)).cast(DoubleType).as("sum_base_price"),
        sum(discPrice).cast(DoubleType).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
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
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
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

  /** Filter + narrow projection. The point at scale: both the range
    * predicate and the 3-column ReadSchema reach the parquet scan
    * (PushedFilters), so the other 8 columns are never decoded. */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 49.0 &&
        col("l_shipdate").between(
          lit("1996-01-01 00:00:00").cast(TimestampType),
          lit("1996-03-31 00:00:00").cast(TimestampType)))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity >= 49.0
      |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-03-31 00:00:00'""".stripMargin

  /** Fact⋈dimension join + agg. part is a dimension that AQE can
    * auto-broadcast at bench scale; at 100 TB it would be bucketed or
    * broadcast depending on SF — we leave the choice to AQE rather than
    * forcing a hint that breaks at 1000×. */
  def q4BrandRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      // Exact decimal SUM then one IEEE conversion: identical in both engines
      // and avoids decimal trailing-zero drift in the driver's hash.
      .agg(sum(discPrice).cast(DoubleType).as("revenue"),
        sum(col("l_quantity")).as("qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))

  val q4Sql: String =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  SUM(l_quantity) AS qty, COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** TPC-H Q5 flavor: 5-way join through the region→nation→customer
    * dimension chain. region/nation are tiny → explicit broadcast; the
    * fact-side joins shuffle on their keys. */
  def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir)
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q5Sql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Global sort + limit with unique tie-break. At scale Spark plans this
    * as TakeOrderedAndProject — no full sort materialization. */
  def q7TopK(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
      .limit(15)

  val q7Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
      |ORDER BY c_acctbal DESC, c_custkey LIMIT 15""".stripMargin

  /** Set operations: customers with both a finished and an open order
    * (INTERSECT), minus customers with any pending order (EXCEPT). */
  def q8SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def keys(status: String) =
      o.filter(col("o_orderstatus") === status).select(col("o_custkey")).distinct()
    keys("F").intersect(keys("O")).except(keys("P")).orderBy(col("o_custkey"))
  }

  val q8Sql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY o_custkey""".stripMargin

  /** Exact distinct counts (expand + two-phase agg under the hood). */
  def q9Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))

  val q9Sql: String =
    """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(*) AS n_rows FROM lineitem""".stripMargin

  /** ROLLUP over status×priority — multi-grouping-set aggregation. */
  def q10Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec2)).cast(DoubleType).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  val q10Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Semi/anti joins (EXISTS / NOT EXISTS): customer counts by segment,
    * split by whether they have orders. Left-semi/anti never widen rows
    * — at scale they shuffle only the key column. */
  def q11SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val okeys = Tables.orders(s, dir).select(col("o_custkey"))
    val withO = c.join(okeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .withColumn("has_orders", lit(true))
    val withoutO = c.join(okeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .withColumn("has_orders", lit(false))
    withO.unionByName(withoutO).orderBy(col("c_mktsegment"), col("has_orders"))
  }

  val q11Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers, TRUE AS has_orders
      |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT c_mktsegment, COUNT(*) AS n_customers, FALSE AS has_orders
      |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment, has_orders""".stripMargin

  /** Scalar expression zoo: string ops, date extraction, CASE, coalesce
    * — all whole-stage-codegen built-ins. */
  def q12Scalar(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 3)).as("prio3"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        when(col("o_totalprice") > 200000.0, "big")
          .when(col("o_totalprice") > 50000.0, "mid")
          .otherwise("small").as("bucket"),
        length(col("o_orderpriority")).as("prio_len"))

  val q12Sql: String =
    """SELECT o_orderkey,
      |  UPPER(SUBSTRING(o_orderpriority, 1, 3)) AS prio3,
      |  o_orderstatus || '-' || o_orderpriority AS tag,
      |  CAST(YEAR(o_orderdate) AS INT) AS yr,
      |  CAST(MONTH(o_orderdate) AS INT) AS mo,
      |  CASE WHEN o_totalprice > 200000.0 THEN 'big'
      |       WHEN o_totalprice > 50000.0 THEN 'mid'
      |       ELSE 'small' END AS bucket,
      |  CAST(LENGTH(o_orderpriority) AS INT) AS prio_len
      |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin

  /** GROUP BY + HAVING against an aggregated scalar (no driver-side
    * collect: the 1-row cutoff is broadcast-joined into the plan). */
  def q13Having(s: SparkSession, dir: String): DataFrame = {
    val grouped = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_items"))
    val cutoff = grouped.agg(ceil(avg(col("total_qty"))).as("cutoff"))
    grouped.crossJoin(broadcast(cutoff))
      .filter(col("total_qty") > col("cutoff"))
      .select(col("l_suppkey"), col("total_qty"), col("n_items"))
      .orderBy(col("l_suppkey"))
  }

  val q13Sql: String =
    """WITH g AS (
      |  SELECT l_suppkey, SUM(l_quantity) AS total_qty, COUNT(*) AS n_items
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT l_suppkey, total_qty, n_items FROM g
      |WHERE total_qty > (SELECT CEIL(AVG(total_qty)) FROM g)
      |ORDER BY l_suppkey""".stripMargin

  /** Orders above their priority class's average price. The per-class avg
    * is exact-sum/count (single IEEE division → cross-engine identical).
    * Spark side: window-free formulation via an aggregated self-join;
    * the dimension side (5 rows) broadcasts. */
  def q14Subquery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val avgs = o.groupBy(col("o_orderpriority").as("p2"))
      .agg((sum(col("o_totalprice").cast(dec2)).cast(DoubleType) / count(lit(1)))
        .as("prio_avg"))
    o.join(broadcast(avgs), col("o_orderpriority") === col("p2"))
      .filter(col("o_totalprice") > col("prio_avg"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"), col("prio_avg"))
  }

  val q14Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice, prio_avg
      |FROM orders JOIN (
      |  SELECT o_orderpriority AS p2,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS prio_avg
      |  FROM orders GROUP BY o_orderpriority) a ON o_orderpriority = p2
      |WHERE o_totalprice > prio_avg""".stripMargin

  /** Pivot (conditional aggregation): quantity by linestatus × returnflag. */
  def q16Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity")))
      .orderBy(col("l_linestatus"))

  val q16Sql: String =
    """SELECT l_linestatus,
      |  SUM(l_quantity) FILTER (l_returnflag = 'A') AS "A",
      |  SUM(l_quantity) FILTER (l_returnflag = 'N') AS "N",
      |  SUM(l_quantity) FILTER (l_returnflag = 'R') AS "R"
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
}
