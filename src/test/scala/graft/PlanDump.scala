package graft

/** Ad-hoc: print the formatted plan of one query.
  * `Test/runMain graft.PlanDump <query> [sfDir]` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d_winnow_pairs")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SharedSpark.spark
    val df = SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(12000))
    spark.stop()
  }
}
