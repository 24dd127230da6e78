package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest-at-or-before semantics, hand-verified") {
    val left = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")), // matches right row 101 (09:30)
      (11L, 1L, ts("2024-01-01 12:00:00")), // matches 102 (12:00, INCLUSIVE)
      (12L, 1L, ts("2024-01-01 08:00:00")), // before any right row -> null
      (13L, 2L, ts("2024-01-01 10:00:00")), // other key -> 201
      (14L, 3L, ts("2024-01-01 10:00:00"))  // key with no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 1L, ts("2024-01-01 09:30:00")),
      (102L, 1L, ts("2024-01-01 12:00:00")),
      (103L, 1L, ts("2024-01-01 13:00:00")), // after every left row of user 1
      (201L, 2L, ts("2024-01-01 09:59:59"))
    ).toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asof(left, right, "user_id", "ts", Seq("event_id"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == Map(
      10L -> Some(101L), 11L -> Some(102L), 12L -> None,
      13L -> Some(201L), 14L -> None))
  }

  test("asof join: equal right timestamps break ties to the greatest picked value") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (55L, 7L, ts("2024-01-01 09:00:00")),
      (66L, 7L, ts("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asof(left, right, "user_id", "ts", Seq("event_id")).collect()
    assert(got.head.getLong(3) == 66L)
  }

  test("asof join never stitches picked columns from different right rows") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    // older row has b=7; the MATCHED (newer) row has b=null — the match
    // must carry (a=1, b=null), never repair b from the older row
    val right = Seq(
      (7L, ts("2024-01-01 09:00:00"), Some(9L), Some(7L)),
      (7L, ts("2024-01-01 09:30:00"), Some(1L), None))
      .toDF("user_id", "ts", "a", "b")
    val got = AsOfJoin.asof(left, right, "user_id", "ts", Seq("a", "b")).collect().head
    assert(got.getLong(3) == 1L)
    assert(got.isNullAt(4), s"expected null asof_b, got ${got.get(4)}")
  }

  test("asof join carries multiple picked columns from the same matched row") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (50L, 7L, ts("2024-01-01 09:00:00"), "early"),
      (60L, 7L, ts("2024-01-01 09:30:00"), "late")).toDF("event_id", "user_id", "ts", "tag")
    val got = AsOfJoin.asof(left, right, "user_id", "ts", Seq("event_id", "tag")).collect()
    assert(got.head.getLong(3) == 60L && got.head.getString(4) == "late")
  }

  test("asof join accepts unorderable (map) picked columns") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 09:00:00"), Map("v" -> "old")),
      (7L, ts("2024-01-01 09:30:00"), Map("v" -> "new")))
      .toDF("user_id", "ts", "attrs")
    val got = AsOfJoin.asof(left, right, "user_id", "ts", Seq("attrs")).collect().head
    assert(got.getMap[String, String](3) == Map("v" -> "new"))
  }

  test("asof plan is one shuffle on the key, not a range join") {
    val ev = Tables.events(spark, sf0001)
    val plan = graft.queries.Events.asofClicks(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(800))
  }
}
