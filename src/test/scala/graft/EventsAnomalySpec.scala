package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ev_anomaly: exact-integer z-score outliers (Events.anomalies). */
class EventsAnomalySpec extends AnyFunSuite {
  import SharedSpark._

  test("integer z-score flags == BigInt recomputation; all-integer test has no float path") {
    val got = queries.Events.anomalies(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // driver-side oracle in exact BigInt arithmetic from the raw table
    val raw = Tables.events(spark, sf001)
      .select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(12,2)") * lit(100)).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byType = raw.groupBy(_._2)
    val expect = byType.toSeq.flatMap { case (t, rs) =>
      val n = BigInt(rs.length)
      val s = rs.map(r => BigInt(r._3)).sum
      val ss = rs.map(r => BigInt(r._3) * r._3).sum
      rs.filter { case (_, _, v) =>
        val dev = n * v - s
        dev * dev > 9 * (n * ss - s * s)
      }.map(r => (r._1, t, r._3)).toSeq
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty, "fixture corpus should contain z>3 outliers")
    // flagged values genuinely sit in the tails: each outlier is
    // farther from its type mean than every unflagged event of the type
    byType.foreach { case (t, rs) =>
      val mean = rs.map(_._3.toDouble).sum / rs.length
      val flagged = rs.filter(r => got.contains((r._1, t, r._3)))
      val unflagged = rs.filterNot(r => got.contains((r._1, t, r._3)))
      if (flagged.nonEmpty && unflagged.nonEmpty) {
        assert(flagged.map(r => math.abs(r._3 - mean)).min >
          unflagged.map(r => math.abs(r._3 - mean)).max - 1e-9,
          s"$t: a flagged event is closer to the mean than an unflagged one")
      }
    }
  }

  test("streaming anomaly flags == batch gate (order-invariant integer moments)") {
    // the stream's only state is (n, S, SS) per event type — three
    // integer counters; integer adds commute, so final moments and the
    // flags derived from them equal the batch gate exactly
    val stream = graft.streaming.Streaming
      .anomalyStream(spark, sf001, "anom_stream_spec")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val batch = queries.Events.anomalies(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(stream.nonEmpty && stream == batch,
      s"stream drifted from batch: ${stream.take(3)} vs ${batch.take(3)}")
  }

  test("anomaly plan: one moments aggregate, stats side broadcast, no second shuffle") {
    val df = queries.Events.anomalies(spark, sf001)
    df.collect() // finalize AQE
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"),
      s"per-type moments should broadcast:\n${plan.take(1200)}")
  }
}
