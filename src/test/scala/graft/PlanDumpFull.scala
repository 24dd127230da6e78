package graft

/** Ad-hoc: print the FULL formatted plan of one query (untruncated).
  * `Test/runMain graft.PlanDumpFull <query> [sfDir]` */
object PlanDumpFull {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d_winnow_pairs")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SharedSpark.spark
    val df = SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
