package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

class AnalyticsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: stages must occur strictly after the previous stage") {
    val events = Seq(
      // u1 completes the full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2 clicked BEFORE signup — click doesn't count; purchase needs a
      // qualifying click so it doesn't count either
      (2L, ts("2024-01-02 09:00:00"), "click"),
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      (2L, ts("2024-01-02 11:00:00"), "purchase"),
      // u3 purchase before click: stage2 yes, stage3 no
      (3L, ts("2024-01-03 10:00:00"), "signup"),
      (3L, ts("2024-01-03 10:30:00"), "purchase"),
      (3L, ts("2024-01-03 11:00:00"), "click"),
      // u4 never signed up
      (4L, ts("2024-01-04 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val r = Analytics.funnel(events, "user_id", "ts", "event_type",
      "signup", "click", "purchase").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("funnel: same-timestamp stage event is NOT after the previous stage") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val r = Analytics.funnel(events, "user_id", "ts", "event_type",
      "signup", "click", "purchase").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 0L)))
  }

  test("cohort retention: offsets are whole weeks from the first-event week") {
    val events = Seq(
      // u1 first active Mon 2024-01-01 week; active again 2 weeks later
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      // u2 same cohort week, active only in week 0 (two events, one row)
      (2L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-04 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Analytics.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L)))
  }

  test("gap fill: every day in the user's range appears; values carry forward") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 11:00:00"), 11L, 2.0), // later event wins the day
      (1L, ts("2024-01-04 10:00:00"), 12L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Analytics.gapFillForwardFill(events, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getDate(1).toString, Option(r.get(2)), r.getDouble(3))).toList
      .sortBy(_._1)
    assert(out == List(
      ("2024-01-01", Some(2.0), 2.0),
      ("2024-01-02", None, 2.0), // gap day forward-filled
      ("2024-01-03", None, 2.0),
      ("2024-01-04", Some(9.0), 9.0)))
  }
}
