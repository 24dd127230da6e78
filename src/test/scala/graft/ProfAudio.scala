package graft
object ProfAudio {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"[prof] $tag%-30s ${(System.nanoTime - t0) / 1e9}%.2fs rows=$n")
    }
    // warm
    time("warm_phash")(graft.queries.LlmOps.mmPhash(spark, dir).count())
    time("mm_audio_fp_1")(graft.queries.LlmOps.mmAudioFp(spark, dir).count())
    time("mm_audio_fp_2")(graft.queries.LlmOps.mmAudioFp(spark, dir).count())
    spark.stop()
  }
}
