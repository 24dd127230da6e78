package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
