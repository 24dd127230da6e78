package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the schema-adaptive events ingestion against ALL physical `ts`
  * layouts the testdata generator has shipped (or could ship), via three
  * committed fixtures with identical logical rows
  * (scripts/make_ts_fixtures.py):
  *
  *  - events_ts_nanos: INT64 TIMESTAMP(NANOS) → Spark LongType under
  *    `nanosAsLong` (the round-1..7 generator layout);
  *  - events_ts_ntz: timestamp[us] without isAdjustedToUTC →
  *    TimestampNTZType (the round-8+ layout — hardcoding the nanos
  *    contract against it broke 11 batch gates at analysis and silently
  *    corrupted 4 streaming gates with 1970-era windows);
  *  - events_ts_utc: timestamp[us] with isAdjustedToUTC →
  *    TimestampType.
  *
  * Both the batch loader ([[Tables.events]]) and the streaming source
  * ([[graft.streaming.Streaming.eventsStreamFrom]]) must produce
  * identical output on every layout, so the NEXT testdata regeneration
  * cannot silently break either path again.
  */
class EventsTsLayoutSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private val layouts = Seq("events_ts_nanos", "events_ts_ntz", "events_ts_utc")

  test("the three fixtures really carry three distinct physical ts types") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val types = layouts.map { l =>
      spark.read.parquet(s"${fixture(l)}/events.parquet").schema("ts").dataType
    }
    assert(types == Seq(LongType, TimestampNTZType, TimestampType),
      s"fixture layouts drifted: $types — regenerate with scripts/make_ts_fixtures.py")
  }

  test("batch loader normalizes every layout to the same TimestampType rows") {
    val collected = layouts.map { l =>
      val df = Tables.events(spark, fixture(l))
      assert(df.schema("ts").dataType == TimestampType, s"$l not normalized")
      df.orderBy("event_id").collect().toSeq
    }
    assert(collected(0).nonEmpty)
    assert(collected(0) == collected(1), "nanos vs ntz batch rows differ")
    assert(collected(0) == collected(2), "nanos vs utc batch rows differ")
  }

  test("stream constructed on an EMPTY dir works once files arrive (fallback schema)") {
    import graft.streaming.Streaming
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_stream").toFile
    dir.deleteOnExit()
    // construction must not throw — probe finds nothing, canonical
    // schema takes over (start-stream-then-files-arrive deployment)
    val stream = Streaming.eventsStream(spark, dir.getAbsolutePath)
    assert(stream.schema("ts").dataType == TimestampType)
    val agg = stream
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("empty_start").start()
    try {
      q.processAllAvailable()
      assert(spark.table("empty_start").isEmpty)
      // the files-arrive step: copy the micros-UTC fixture in
      val src = java.nio.file.Paths.get(fixture("events_ts_utc"), "events.parquet")
      java.nio.file.Files.copy(src,
        dir.toPath.resolve("events.parquet"))
      q.processAllAvailable()
      val expected = Tables.events(spark, fixture("events_ts_utc"))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("hour", "event_type").collect().toSeq
      val got = spark.table("empty_start").orderBy("hour", "event_type").collect().toSeq
      assert(got == expected, s"late-arriving files misread: $got")
    } finally q.stop()
  }

  test("streaming source normalizes every layout to the batch answer (hourly agg)") {
    import graft.streaming.Streaming
    val expected = Tables.events(spark, fixture("events_ts_nanos"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("hour", "event_type")
      .collect().toSeq
    assert(expected.size > 2, s"fixture too trivial: $expected")
    layouts.foreach { l =>
      val name = s"ts_layout_$l"
      val agg = Streaming.eventsStream(spark, fixture(l))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(name).orderBy("hour", "event_type").collect().toSeq
      assert(got == expected, s"streaming on $l drifted from batch: $got")
    }
  }
}
