package graft

import java.sql.Timestamp
import java.time.Duration

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Events

/** N-stage funnel operator: hand-computed 4-stage fixture plus the
  * invariants the gate's 3-stage instantiation relies on. */
class FunnelSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private val stages4 = Seq(
    "signup" -> (col("event_type") === "signup"),
    "browse" -> (col("event_type") === "browse"),
    "cart" -> (col("event_type") === "cart"),
    "buy" -> (col("event_type") === "buy"))

  test("4-stage funnel: ordering, anchor window, per-stage counts") {
    // within = 30 min from each user's FIRST signup (the anchor)
    val events = Seq(
      // u1 completes all 4 stages in order inside the window
      (1L, "signup", ts(0)), (1L, "browse", ts(5)), (1L, "cart", ts(10)), (1L, "buy", ts(20)),
      // u2 reaches cart, but buys BEFORE cart -> buy must not count
      (2L, "signup", ts(0)), (2L, "browse", ts(5)), (2L, "buy", ts(8)), (2L, "cart", ts(12)),
      // u3's cart lands outside the 30-min anchor window
      (3L, "signup", ts(0)), (3L, "browse", ts(25)), (3L, "cart", ts(40)),
      // u4 never signs up -> contributes to no stage
      (4L, "browse", ts(1)), (4L, "cart", ts(2)), (4L, "buy", ts(3)),
      // u5: second signup is ignored (anchor = FIRST); browse between
      // the signups still counts (it follows the first)
      (5L, "signup", ts(2)), (5L, "browse", ts(4)), (5L, "signup", ts(6))
    ).toDF("user_id", "event_type", "ts")
    val row = Events.funnelStages(events, stages4, Duration.ofMinutes(30)).head
    assert(row.getLong(row.fieldIndex("n_signup")) == 4)  // u1 u2 u3 u5
    assert(row.getLong(row.fieldIndex("n_browse")) == 4)  // u1 u2 u3 u5
    assert(row.getLong(row.fieldIndex("n_cart")) == 2)    // u1 u2 (u3 late)
    assert(row.getLong(row.fieldIndex("n_buy")) == 1)     // u1 (u2 pre-cart)
    graft.util.IntermediateCaches.releaseAll(blocking = true)
  }

  test("stage timestamps must be strictly increasing: a tie does not advance") {
    val events = Seq(
      (1L, "signup", ts(0)), (1L, "browse", ts(0)), // browse NOT after signup
      (2L, "signup", ts(0)), (2L, "browse", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val row = Events.funnelStages(events, stages4.take(2), Duration.ofMinutes(30)).head
    assert(row.getLong(row.fieldIndex("n_signup")) == 2)
    assert(row.getLong(row.fieldIndex("n_browse")) == 1)
    graft.util.IntermediateCaches.releaseAll(blocking = true)
  }

  test("funnelStages rejects a single-stage funnel") {
    val events = Seq((1L, "signup", ts(0))).toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      Events.funnelStages(events, stages4.take(1), Duration.ofMinutes(30))
    }
  }

  test("the gate funnel is the 3-stage instantiation (column names + fixture values)") {
    // view->click->purchase semantics on a fixture with one full
    // conversion, one click outside the 24h anchor window, one
    // pre-click purchase
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "view", ts(0)), (2L, "purchase", ts(1)), (2L, "click", ts(2)),
      (3L, "view", ts(0))
    ).toDF("user_id", "event_type", "ts")
    val row = Events.funnelStages(events, Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")),
      Duration.ofHours(24)).head
    assert(row.schema.fieldNames.toSeq == Seq("n_view", "n_click", "n_purchase"))
    assert(row.getLong(0) == 3 && row.getLong(1) == 2 && row.getLong(2) == 1)
    graft.util.IntermediateCaches.releaseAll(blocking = true)
  }
}
