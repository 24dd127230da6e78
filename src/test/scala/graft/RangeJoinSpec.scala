package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("banded range join equals the naive BETWEEN join, boundaries inclusive") {
    val rng = new scala.util.Random(11)
    val points = (0 until 300).map(i => (i.toLong, rng.nextInt(10000).toLong))
      .toDF("p_id", "pt")
    val intervals = (0 until 80).map { i =>
      val lo = rng.nextInt(9500).toLong
      (1000L + i, lo, lo + rng.nextInt(900).toLong) // spans cross bucket edges (width 256)
    }.toDF("i_id", "lo", "hi")
    val banded = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 256L)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive)
    assert(banded.nonEmpty)
    // boundary inclusivity, exactly once despite the interval spanning buckets
    val bp = Seq((1L, 512L), (2L, 767L), (3L, 768L)).toDF("p_id", "pt")
    val bi = Seq((9L, 512L, 767L)).toDF("i_id", "lo", "hi")
    val hits = RangeJoin.pointInInterval(bp, "pt", bi, "lo", "hi", 256L)
      .groupBy("p_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L, 2L -> 1L))
  }

  test("range join rejects colliding column names") {
    val df = Seq((1L, 2L)).toDF("a", "x")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(df, "a", df, "a", "x", 10L)
    }
  }

  test("banded plan is an equi-join on the bucket, not a nested loop") {
    val plan = graft.queries.Events.rangeActiveSessions(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }
}
