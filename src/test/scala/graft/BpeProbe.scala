package graft

/** Ad-hoc: time Bpe.learnMerges end-to-end at a given K.
  * `Test/runMain graft.BpeProbe <k> [sfDir]` */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(32)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SharedSpark.spark
    import org.apache.spark.sql.functions._
    val wf = Tables.documents(spark, dir)
      .select(explode(graft.text.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val t0 = System.nanoTime()
    val merges = graft.text.Bpe.learnMerges(wf, k)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] learnMerges k=$k: $sec%.1f s, ${merges.size} merges, last=${merges.lastOption}")
    println(s"[probe] leaked persistent RDDs: ${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
