package graft

import org.apache.spark.sql.functions._

/** Ad-hoc: codegen NearestCentroid vs interpreted HOF argmax at
  * production-ish cell counts.
  * `Test/runMain graft.CentroidBench [replicate] [nCells]` */
object CentroidBench {
  def main(args: Array[String]): Unit = {
    val replicate = args.headOption.map(_.toInt).getOrElse(64)
    val nCells = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val spark = SharedSpark.spark
    val emb0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    // widen the corpus: re-key replicas so ids stay unique
    val emb = (0 until replicate).map(r =>
      emb0.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionAll _)
      .repartition(32).persist()
    val n = emb.count()
    val seeds = graft.similarity.Ann.ivfSeeds(emb, nCells, 0, "vec_id", "embedding")
      .persist()
    seeds.count()
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.select(max(col("cell"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[centroid-bench] $label%-10s n=$n nCells=$nCells min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("codegen")(graft.similarity.Ann.ivfAssign(emb, nCells))
    time("hof")(graft.similarity.Ann.assignToSeedsHof(emb, seeds, "vec_id", "embedding"))
    spark.stop()
  }
}
