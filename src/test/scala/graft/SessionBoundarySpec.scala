package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.{PendingSession, SessEvent, SessionState, Streaming}

/** Pins the session GAP-BOUNDARY convention across all sessionization
  * surfaces: Spark's native session_window MERGES an event arriving
  * exactly `gap` after the previous one (UpdatingSessionsIterator:
  * sessionStart ≤ sessionEnd merges) — so the lag-based batch queries,
  * the SQL oracles and the custom-state sessionizer must all split only
  * on a STRICTLY greater gap. Round 4 found the oracles splitting at ≥
  * (latent: the synthetic micros never land on an exact boundary). */
class SessionBoundarySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("native session_window merges at exactly gap, splits just past it") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:30:00")), // exactly 30:00
      (2L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 10:29:59.999999")),
      (3L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (3L, java.sql.Timestamp.valueOf("2026-01-01 10:30:00.000001"))
    ).toDF("user_id", "ts")
    val got = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(got(1L) == Seq(2L), "exact-gap event must merge")
    assert(got(2L) == Seq(2L))
    assert(got(3L) == Seq(1L, 1L), "gap+1µs must split")
  }

  test("lag-based batch sessionization uses the same strictly-greater split") {
    val df = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (1L, 11L, java.sql.Timestamp.valueOf("2026-01-01 10:30:00")),
      (3L, 30L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (3L, 31L, java.sql.Timestamp.valueOf("2026-01-01 10:30:00.000001"))
    ).toDF("user_id", "event_id", "ts")
    df.createOrReplaceTempView("boundary_events")
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = df
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id")).agg(sum(col("new_sess")).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions == Map(1L -> 1L, 3L -> 2L))
  }

  test("sessionize fold: exact-gap merge, emission strictly honors end <= watermark") {
    val gapUs = 1800L * 1000000L
    val t0 = 1000000000000000L // arbitrary epoch micros
    def run(eventUs: Seq[Long], wmMs: Long,
        prior: Option[SessionState] = None) = {
      val state = TestGroupState.create[SessionState](
        org.apache.spark.api.java.Optional.fromNullable(prior.orNull),
        GroupStateTimeout.EventTimeTimeout, 0L,
        org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(wmMs)), false)
      val out = Streaming.sessionize(gapUs)(
        7L, eventUs.map(SessEvent(7L, null, _)).iterator, state).toList
      (out, state)
    }
    // exact-gap pair merges into ONE session (end = last + gap > wm → pending)
    val (out1, st1) = run(Seq(t0, t0 + gapUs), (t0 + 2 * gapUs) / 1000 - 1)
    assert(out1.isEmpty)
    assert(st1.get.pending == Seq(PendingSession(t0, t0 + gapUs, 2)))
    // gap+1µs pair splits; the first session's end (t0+gap) ≤ wm → emitted
    val (out2, st2) = run(Seq(t0, t0 + gapUs + 1), (t0 + gapUs) / 1000)
    assert(out2.map(o => (o.start_us, o.end_us, o.n_events)) ==
      List((t0, t0 + gapUs, 1L)))
    assert(st2.get.pending.map(_.n) == Seq(1L))
    // end exactly ON the watermark is emitted (end ≤ wm, not <) — and the
    // retained session's timeout parks BELOW its end so the strict
    // timeout condition still fires once the watermark reaches the end
    val endMs = (t0 + gapUs) / 1000
    val (out3, st3) = run(Seq(t0), endMs)
    assert(out3.map(_.end_us) == List(t0 + gapUs))
    assert(!st3.exists)
    val (out4, st4) = run(Seq(t0), endMs - 2)
    assert(out4.isEmpty && st4.exists)
    assert(st4.getTimeoutTimestampMs.get < endMs,
      "timeout must park strictly below the session end (strict-fire semantics)")
    // the tight corner: watermark ONE ms below the session end — the park
    // must still be < end (Spark accepts a timeout AT the watermark), or a
    // final watermark landing exactly on ceil(end) would never fire
    val (out5, st5) = run(Seq(t0), endMs - 1)
    assert(out5.isEmpty && st5.exists)
    assert(st5.getTimeoutTimestampMs.get < endMs,
      s"park=${st5.getTimeoutTimestampMs.get} must be < end=$endMs at wm=end-1")
  }
}
