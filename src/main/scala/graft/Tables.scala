package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table loader for the driver-generated parquet test data
  * (TPC-H-ish star schema + events/documents/embeddings; see TESTDATA.md).
  *
  * All queries go through here so that scan-level concerns (schema
  * pruning, filter pushdown) are uniform. `spark.read.parquet` gives the
  * vectorized parquet reader; Catalyst prunes columns/filters at the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped with THREE physical layouts for `ts`
    * across testdata generations, so ingestion is schema-adaptive
    * (hardcoding any one layout broke 15 gates when the generator
    * switched from INT64 TIMESTAMP(NANOS) to timestamp[us]):
    *
    *  - INT64 TIMESTAMP(NANOS): Spark's reader rejects it outright, so
    *    `nanosAsLong` surfaces it as LongType and we convert with
    *    integer division (`div`, not `/`: double division loses
    *    precision above 2^53 — epoch-nanos are ~1.7e18; truncation
    *    toward zero matches DuckDB's ns→us cast);
    *  - timestamp[us] WITHOUT isAdjustedToUTC → TimestampNTZType: the
    *    session runs in UTC (Verify/Bench/SharedSpark all pin it), so
    *    the NTZ wall-clock IS the UTC instant — cast to TimestampType;
    *  - timestamp[us] WITH isAdjustedToUTC → TimestampType: as-is.
    *
    * Setting `nanosAsLong` unconditionally is safe: it only affects
    * TIMESTAMP(NANOS) columns, micros still read as timestamps.
    * EventsTsLayoutSpec pins all the layouts with committed fixtures so
    * a testdata regeneration cannot silently break any path again. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** Rewrite an events frame's `ts` to TimestampType (micros, UTC
    * instant) regardless of which physical layout it was read as.
    * Shared by the batch loader above and the streaming source
    * ([[graft.streaming.Streaming.eventsStreamFrom]]). */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other — extend Tables.normalizeEventTs")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
