package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb executor/codegen-infrastructure startup so the first timed
    // query isn't charged for session warmup; deterministic run order
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    // steady-state timing: best of 2 runs per query — a single pass
    // charges whichever query runs first after a heavy one for GC /
    // broadcast-cleanup noise rather than the query itself
    // deterministic order, but stateful streaming queries run LAST: their
    // state-store/memory-sink churn otherwise inflates whichever batch
    // queries happen to follow them alphabetically
    val results = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
      (if (name.startsWith("st_")) "zzz_" else "") + name
    }.map { case (name, fn) =>
      // a failed attempt must NOT count as a (fast) timing: report -1 so
      // a crashing query reads as broken, never as an improvement
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        } finally {
          // some operators persist intermediates (shingle index, LSH
          // shingle sets); each run builds a fresh plan = fresh cache
          // entry, so drop them between runs or they accumulate and
          // charge later queries for eviction/GC
          spark.catalog.clearCache()
        }
      }
      val (a, b) = (once(), once())
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
