package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing = the 100 TB co-located-join lever: writing both join
  * sides bucketed (and sorted) on the join key lets the sort-merge join
  * read bucket-aligned files with NO exchange on either side — the
  * shuffle is paid once at write time and amortized over every
  * subsequent join. */
class BucketingSpec extends AnyFunSuite {
  import SharedSpark._

  test("bucketed+sorted tables sort-merge join with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      Tables.orders(spark, sf0001)
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), s"co-located join still shuffles:\n${plan.take(800)}")
      // same answer as the unbucketed join
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    spark.sql("DROP TABLE IF EXISTS b_agg")
    try {
      Tables.orders(spark, sf0001).select("o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_custkey").mode("overwrite").saveAsTable("b_agg")
      val agg = spark.table("b_agg").groupBy("o_custkey").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
      assert(agg.count() ==
        Tables.orders(spark, sf0001).select("o_custkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
