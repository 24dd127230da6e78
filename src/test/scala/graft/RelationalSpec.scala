package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RelationalSpec extends AnyFunSuite {
  import SharedSpark._

  test("q1_agg returns grouped exact sums") {
    val df = SparkEntry.queries("q1_agg")(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.sorted.toSeq == Seq("avg_qty", "count_order",
      "l_linestatus", "l_returnflag", "sum_base_price", "sum_disc_price", "sum_qty"))
    // cross-check count against a direct Spark computation
    val expectTotal = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp")).count()
    assert(rows.map(_.getAs[Long]("count_order")).sum == expectTotal)
  }

  test("q3_join returns top-10 deterministic") {
    val df = SparkEntry.queries("q3_join")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q6_window rn bounded by 3 and running_qty monotone per supplier") {
    val df = SparkEntry.queries("q6_window")(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("rn") <= 3))
  }

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
