package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.EventAnalytics

/** Funnel ordering semantics and retention week arithmetic on planted
  * event logs (the q137/q138 gates prove oracle agreement at scale;
  * this pins the tricky orderings by hand). */
class EventAnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict ordering, out-of-order steps don't convert") {
    val e = Seq(
      // u1 converts fully, in order
      (1L, ts("2026-01-05 10:00:00"), "view"),
      (1L, ts("2026-01-05 10:05:00"), "click"),
      (1L, ts("2026-01-05 10:10:00"), "purchase"),
      // u2: clicked BEFORE viewing — click must not count; a later
      // click exists, and the purchase sits between view and click,
      // so it must not count either
      (2L, ts("2026-01-05 09:00:00"), "click"),
      (2L, ts("2026-01-05 10:00:00"), "view"),
      (2L, ts("2026-01-05 10:30:00"), "purchase"),
      (2L, ts("2026-01-05 11:00:00"), "click"),
      // u3: view only
      (3L, ts("2026-01-05 08:00:00"), "view"),
      // u4: never viewed — not in the funnel at all
      (4L, ts("2026-01-05 08:00:00"), "purchase"),
      // u5: simultaneous view+click — strict '>' rejects the click
      (5L, ts("2026-01-05 08:00:00"), "view"),
      (5L, ts("2026-01-05 08:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    val u1 = out(0); val u2 = out(1); val u3 = out(2); val u5 = out(3)
    assert(!u1.isNullAt(1) && !u1.isNullAt(2) && !u1.isNullAt(3))
    assert(u1.getLong(2) > u1.getLong(1) && u1.getLong(3) > u1.getLong(2))
    // u2 reaches click only via the 11:00 event; no purchase after it
    assert(!u2.isNullAt(2) && u2.isNullAt(3))
    assert(u2.getLong(2) > u2.getLong(1))
    assert(u3.isNullAt(2) && u3.isNullAt(3))
    assert(u5.isNullAt(2))
  }

  test("retention: cohort = ISO week of first event, offsets exact") {
    // 2026-01-05 is a Monday; u1 first active that week, again 2 weeks
    // later; u2 first active week 2, also active week 2 (same week
    // twice = one distinct); u3 only week 1
    val e = Seq(
      (1L, ts("2026-01-06 10:00:00"), "view"),
      (1L, ts("2026-01-20 10:00:00"), "view"),
      (2L, ts("2026-01-14 10:00:00"), "view"),
      (2L, ts("2026-01-16 10:00:00"), "view"),
      (3L, ts("2026-01-07 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.retentionWeeks(e, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2026-01-05", 0, 2L),  // u1+u3 active in their cohort week
      ("2026-01-05", 2, 1L),  // u1 returns two weeks later
      ("2026-01-12", 0, 1L))) // u2's cohort, one distinct user
  }
}
