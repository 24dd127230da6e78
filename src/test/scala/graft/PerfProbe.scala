package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc isolated per-query timing: `Test/runMain graft.PerfProbe
  * <sfDir> <query...>` — same session shape as Bench, min of 3. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (t, n)
      }
      println(f"[probe] $name%-22s min=${ts.map(_._1).min}%.3f s  runs=${ts.map(t => f"${t._1}%.3f").mkString(",")}  rows=${ts.head._2}")
    }
    spark.stop()
  }
}
