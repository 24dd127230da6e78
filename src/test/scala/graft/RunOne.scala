package graft

/** Ad-hoc: run one gate query and print its rows + timing (twice — the
  * second timing is the steady-state number comparable to Bench).
  * `Test/runMain graft.RunOne <query> [sfDir] [maxRows]` */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val maxRows = args.drop(2).headOption.map(_.toInt).getOrElse(50)
    val spark = SharedSpark.spark
    def once(show: Boolean): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      if (show) df.show(maxRows, truncate = false) else df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.util.IntermediateCaches.releaseAll(blocking = true)
      spark.catalog.clearCache()
      sec
    }
    val a = once(show = true)
    val b = once(show = false)
    println(f"[runone] $name: cold $a%.2f s, warm $b%.2f s, " +
      s"tracked caches after release: ${graft.util.IntermediateCaches.trackedCount}")
    spark.stop()
  }
}
