package graft

import java.sql.Timestamp
import graft.operators.Events

/** Funnel and retention semantics on hand-built event streams: step
  * ordering (a click BEFORE the first view must not convert), exact
  * integer lag means, and cohort-offset cell counts. */
class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel counts only in-order conversions and averages lags exactly") {
    val ev = Seq(
      // user 1: clean view → click(+10 s) → purchase(+20 s)
      (1L, "view", ts("2026-01-01 00:00:00")),
      (1L, "click", ts("2026-01-01 00:00:10")),
      (1L, "purchase", ts("2026-01-01 00:00:20")),
      // user 2: click BEFORE the first view, never clicks again — the
      // out-of-order click must NOT count as a step-2 conversion
      (2L, "click", ts("2026-01-01 00:00:00")),
      (2L, "view", ts("2026-01-01 00:00:05")),
      // user 3: view → click(+30 s), no purchase; a pre-view purchase
      // that must not count either
      (3L, "purchase", ts("2026-01-01 00:00:00")),
      (3L, "view", ts("2026-01-01 00:01:00")),
      (3L, "click", ts("2026-01-01 00:01:30")),
      // user 4: purchase only — reaches no step
      (4L, "purchase", ts("2026-01-01 00:00:00")),
    ).toDF("user_id", "event_type", "ts")
    val got = Events.eventFunnelOf(ev)
      .as[(Int, String, Long, Option[Long])].collect().sortBy(_._1)
    assert(got === Seq(
      (1, "view", 3L, None),                    // users 1, 2, 3
      (2, "click", 2L, Some(20000000L)),        // users 1, 3; (10+30)/2 s
      (3, "purchase", 1L, Some(10000000L)),     // user 1 only
    ))
  }

  test("funnel ties at the same instant convert (at-or-after, not strictly-after)") {
    val ev = Seq(
      (1L, "view", ts("2026-01-01 00:00:00")),
      (1L, "click", ts("2026-01-01 00:00:00")),
      (1L, "purchase", ts("2026-01-01 00:00:00")),
    ).toDF("user_id", "event_type", "ts")
    val got = Events.eventFunnelOf(ev)
      .as[(Int, String, Long, Option[Long])].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._3)) === Seq((1, 1L), (2, 1L), (3, 1L)))
    assert(got(1)._4 === Some(0L) && got(2)._4 === Some(0L))
  }

  test("retention cohorts by first-seen day with exact day offsets") {
    val ev = Seq(
      (1L, "view", ts("2026-01-01 09:00:00")),
      (1L, "click", ts("2026-01-01 23:59:59")), // same day: one active-day row
      (1L, "view", ts("2026-01-02 00:00:01")),
      (1L, "view", ts("2026-01-04 12:00:00")),
      (2L, "view", ts("2026-01-02 08:00:00")),
    ).toDF("user_id", "event_type", "ts")
    val got = Events.retentionCohortsOf(ev)
      .selectExpr("CAST(cohort_date AS STRING)", "day_offset", "n_users")
      .as[(String, Int, Long)].collect().toSet
    assert(got === Set(
      ("2026-01-01", 0, 1L), ("2026-01-01", 1, 1L), ("2026-01-01", 3, 1L),
      ("2026-01-02", 0, 1L),
    ))
  }
}
