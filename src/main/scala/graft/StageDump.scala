package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staged-verification dump for the three pipeline capstones — the sf1
  * scale-oracle path: DuckDB cannot replay the MONOLITHIC pipeline CTE
  * chains at sf1 (the round-11 attempt exceeded 54 GB of temp), but
  * every single stage fits comfortably, so this main materializes each
  * stage's OUTPUT to parquet and `scripts/stage_oracle.py` re-derives
  * each stage from its INPUT parquet + the source tables and
  * hash-compares. Composition bugs cannot hide between stages: stage N
  * is verified against the exact artifact stage N+1 consumed.
  *
  * Usage: sbt "runMain graft.StageDump <sfDir> <outDir>"
  */
object StageDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      System.err.println(s"[stagedump] wrote $name")
    }

    // --sql-only refreshes stage_oracle_sql.json without re-running the
    // (expensive) stage materialization — for oracle-SQL-only edits
    val sqlOnly = args.contains("--sql-only")

    // ---- t_pipeline_e2e ------------------------------------------------
    if (!sqlOnly) {
      val st = queries.LlmOps.pipelineE2eStages(spark, sfDir)
      write("e2e_s1_filt",
        st.filt.select(col("doc_id"), col("lang"), col("n_chars"), col("ntok")))
      write("e2e_s2_pairs",
        st.pairs.select(col("doc_a"), col("doc_b"),
          round(col("jaccard"), 6).as("jaccard")))
      write("e2e_s2_dd",
        st.dd.select(col("doc_id"), col("lang"), col("n_chars"), col("ntok")))
      write("e2e_s3_clean",
        st.clean.select(col("doc_id"), col("lang"), col("n_chars"), col("ntok")))
      write("e2e_s4_mixed",
        st.mixed.select(col("doc_id"), col("lang"), col("ntok")))
      write("e2e_s5_packs", st.packs)
      write("e2e_card", queries.LlmOps.pipelineE2eCard(st))
      graft.util.IntermediateCaches.releaseAll(blocking = true)
      spark.catalog.clearCache()
    }

    // ---- t_pipeline_spans ----------------------------------------------
    if (!sqlOnly) {
      val st = queries.LlmOps.pipelineSpansStages(spark, sfDir)
      write("spans_s1_filt", st.filt)
      write("spans_s2_spans", st.spans)
      write("spans_s3_cut", st.cut)
      write("spans_card", st.card)
      graft.util.IntermediateCaches.releaseAll(blocking = true)
      spark.catalog.clearCache()
    }

    // ---- t_pipeline_semantic -------------------------------------------
    if (!sqlOnly) {
      val st = queries.LlmOps.pipelineSemanticStages(spark, sfDir)
      write("sem_s1_textpairs",
        st.textPairs.select(col("doc_a"), col("doc_b"),
          round(col("jaccard"), 6).as("jaccard")))
      write("sem_s2_textlosers", st.textLosers)
      write("sem_s3_semlosers", st.semLosers)
      write("sem_card", st.card)
      graft.util.IntermediateCaches.releaseAll(blocking = true)
      spark.catalog.clearCache()
    }

    // the per-stage oracle SQLs ride with the artifact (same JSON-escape
    // discipline as Verify's oracle_sql.json)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = queries.LlmOps.pipelineStageOracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/stage_oracle_sql.json"), json)

    System.err.println("[stagedump] done")
    spark.stop()
  }
}
