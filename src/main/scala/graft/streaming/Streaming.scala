package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table. The same
  * aggregation logic as the batch queries, expressed incrementally:
  * file source → event-time window + watermark → sink. For the
  * correctness gate the stream is driven synchronously to completion
  * (`processAllAvailable`) against the static parquet, which must equal
  * the batch answer — the Dataflow-style batch/stream equivalence test.
  *
  * Scale: stateful aggregation partitions by (window, type) — state per
  * key lives in the state store; the watermark bounds state size.
  */
object Streaming {

  /** events.parquet carries INT64 TIMESTAMP(NANOS); file streams need an
    * explicit schema, so read ts as Long (nanosAsLong) and convert. */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet") // basePath must be a dir
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Synchronous replay window: every micro-batch of a stateful query
    * commits one state-store instance PER shuffle partition per
    * operator, so a 32-partition replay of a small static file pays 32×
    * the state/checkpoint fixed cost for no parallelism win. Scope the
    * partition count down for the replay and restore it after — a
    * production deployment sizes this to its key cardinality instead. */
  private def withReplayPartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Hourly tumbling-window totals per event type, with a 1-hour
    * watermark. Run synchronously to a memory sink; returns the final
    * table (complete mode). */
  def hourlyWindowed(s: SparkSession, dir: String,
      queryName: String = "graft_stream_hourly"): DataFrame = {
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // Exact decimal SUM then one IEEE conversion — matches the batch
        // ev_hourly and dodges decimal trailing-zero drift in the oracle hash.
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))
    withReplayPartitions(s, 4) {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(queryName).orderBy(col("hour"), col("event_type"))
  }

  /** Streaming sessionization with NATIVE session windows: watermarked
    * append mode emits exactly the sessions closed by the final
    * watermark (= max event time floored to ms, minus the delay). The
    * oracle replicates batch sessionization plus that closure filter —
    * the session-window flavor of the Dataflow batch/stream equivalence
    * gate. */
  def sessionsWindowed(s: SparkSession, dir: String,
      queryName: String = "graft_stream_sessions"): DataFrame = {
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"))
    withReplayPartitions(s, 4) {
      val q = agg.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(queryName).orderBy(col("user_id"), col("sess_start"))
  }

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming exact dedup — the corpus-cleaning pipeline as a stream:
    * md5-fingerprint groups maintained incrementally (complete mode), so
    * arriving documents continuously fold into their dup group. The
    * final table must equal the BATCH `d_exact` answer — same oracle
    * SQL. (keep_id = MIN over the group is arrival-order independent,
    * unlike dropDuplicates' keep-first.)
    *
    * STATE-SIZE CAVEAT (scale): complete-mode groupBy state is
    * O(distinct fingerprints) and never expires — correct as a finite
    * replay GATE (the memory sink is the oracle mechanism), unbounded
    * on a 100 TB continuous corpus. The production shape is
    * [[exactDedupStreamWatermarked]]: watermarked
    * `dropDuplicatesWithinWatermark` keeps only the fingerprints seen
    * within the watermark horizon, bounding state by arrival rate ×
    * horizon. */
  def exactDedupStream(s: SparkSession, dir: String,
      queryName: String = "graft_stream_dedup"): DataFrame = {
    val agg = s.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("doc_id"), graft.text.fingerprint_md5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
    withReplayPartitions(s, 4) {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(queryName)
  }

  /** Watermarked streaming exact dedup — the shape that survives an
    * unbounded corpus: `dropDuplicatesWithinWatermark` on the text
    * fingerprint emits each fingerprint's FIRST arrival immediately
    * (append mode) and expires a fingerprint's dedup state once the
    * watermark passes its event time + delay, so state is
    * O(fingerprints per watermark horizon) instead of O(all distinct
    * fingerprints ever). The contract weakens accordingly: duplicates
    * separated by more than the horizon are NOT collapsed — pick the
    * delay to cover the pipeline's real reordering window.
    *
    * Documents carry no event time, so the replay synthesizes a
    * deterministic arrival timestamp from doc_id (1 s apart); a
    * production stream would use its ingestion time. Spec
    * (StreamingSpec): output == batch keep-one-per-fingerprint within
    * the horizon. */
  def exactDedupStreamWatermarked(s: SparkSession, dir: String,
      delay: String = "1 hour",
      queryName: String = "graft_stream_dedup_wm"): DataFrame = {
    val deduped = s.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      // offset past epoch 0: the stream's INITIAL watermark is epoch 0,
      // and a row whose event time sits at/below the watermark is
      // discarded as late — doc_id 0 would silently vanish
      .select(col("doc_id"),
        timestamp_seconds(col("doc_id") + lit(1000000000L)).as("ts"),
        graft.text.fingerprint_md5(col("text")).as("fp"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")
    withReplayPartitions(s, 4) {
      val q = deduped.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(queryName)
  }

  val sessionsWindowedSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |         OR EPOCH_US(CAST(ts AS TIMESTAMP)) - EPOCH_US(CAST(LAG(ts) OVER w AS TIMESTAMP)) >= 1800 * 1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      |  FROM marked),
      |agg AS (
      |  SELECT user_id, MIN(ts) AS sess_start,
      |    MAX(ts) + INTERVAL 30 MINUTE AS sess_end, COUNT(*) AS n_events
      |  FROM sess GROUP BY user_id, sess_id)
      |SELECT user_id, sess_start, sess_end, n_events FROM agg
      |WHERE sess_end <= date_trunc('milliseconds',
      |    (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events)) - INTERVAL 10 MINUTE
      |ORDER BY user_id, sess_start""".stripMargin

  val hourlyWindowedSql: String =
    """SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
