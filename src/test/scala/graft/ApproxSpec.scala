package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB substitutes for exact distinct
  * and exact percentile (both exact forms are gate queries: q9, q23).
  * No DuckDB oracle (HLL/KLL sketches differ across engines); asserted
  * against the exact answers with the documented error bounds. */
class ApproxSpec extends AnyFunSuite {
  import SharedSpark._

  private lazy val li = Tables.lineitem(spark, sf001)

  test("approx_count_distinct (HLL) within its rsd bound of exact") {
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx"))
      .collect().head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    // 0.02 rsd → 3 sigma ≈ 6%
    assert(math.abs(approx - exact).toDouble / exact <= 0.06,
      s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx"))
      .collect().head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact <= 0.01, s"exact=$exact approx=$approx")
  }
}
