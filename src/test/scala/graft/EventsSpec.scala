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

  test("anomaly windows: strict 3-sigma flag, exact-boundary and high-variance cases stay quiet") {
    def hours(tpe: String, counts: Seq[Int]): Seq[(Long, String, Timestamp)] =
      counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => (1L, tpe, ts(f"2026-01-01 $h%02d:${i % 60}%02d:00")))
      }
    // a: ten quiet hours of 1 + one hour of 5 → (cN−S)² = 100(k−1)² >
    //    90(k−1)² = 9·(QN−S²): flagged
    // b: NINE quiet hours of 1 + one hour of 7 → algebra gives exact
    //    equality 81(k−1)² = 81(k−1)² at ANY spike height: 3σ exactly,
    //    strict > must NOT flag
    // c: two windows (5, 50) → with N=2 the spike IS the variance; a
    //    naive threshold detector would scream, z-test stays quiet
    val ev = (hours("a", Seq.fill(10)(1) :+ 5) ++
      hours("b", Seq.fill(9)(1) :+ 7) ++
      hours("c", Seq(5, 50))).toDF("user_id", "event_type", "ts")
    val got = Events.anomalyWindowsOf(ev)
      .selectExpr("event_type", "CAST(window_start AS STRING)", "n_events", "mean_milli")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", "2026-01-01 10:00:00", 5L, 15000L / 11L)))
  }

  test("type transitions: per-user ordering, tie-break by event_id, integer micro-probs") {
    val ev = Seq(
      // user 1: view → click → view  (transitions: v→c, c→v)
      (10L, 1L, "view", ts("2026-01-01 00:00:00")),
      (11L, 1L, "click", ts("2026-01-01 00:00:10")),
      (12L, 1L, "view", ts("2026-01-01 00:00:20")),
      // user 2: view → view — and the second pair shares a timestamp, so
      // event_id must break the tie (13 before 14)
      (13L, 2L, "view", ts("2026-01-01 00:00:00")),
      (14L, 2L, "view", ts("2026-01-01 00:00:00")),
      // user 3: a single event — no transition; and no cross-user
      // transition to user 1 despite adjacent timestamps
      (15L, 3L, "click", ts("2026-01-01 00:00:05")),
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.typeTransitionsOf(ev)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("view", "click", 1L, 500000L),  // of 2 view-outgoing transitions
      ("view", "view", 1L, 500000L),
      ("click", "view", 1L, 1000000L),
    ))
  }

  test("skew-resistant transitions equal the plain form, including bucket-boundary pairs") {
    // user 1 crosses three hour buckets with an empty bucket in between:
    // the boundary stitch must pair 00:59 → 02:01 across the gap
    val ev = Seq(
      (1L, 1L, "view", ts("2026-01-01 00:10:00")),
      (2L, 1L, "click", ts("2026-01-01 00:59:59")),
      (3L, 1L, "purchase", ts("2026-01-01 02:01:00")),
      (4L, 1L, "view", ts("2026-01-01 02:30:00")),
      // user 2: same-timestamp tie inside one bucket
      (5L, 2L, "view", ts("2026-01-01 05:00:00")),
      (6L, 2L, "error", ts("2026-01-01 05:00:00")),
      // user 3: one event per bucket — ALL pairs are boundary pairs
      (7L, 3L, "view", ts("2026-01-01 10:30:00")),
      (8L, 3L, "click", ts("2026-01-01 11:30:00")),
      (9L, 3L, "purchase", ts("2026-01-01 12:30:00")),
    ).toDF("event_id", "user_id", "event_type", "ts")
    val plain = Events.typeTransitionsOf(ev)
      .as[(String, String, Long, Long)].collect().toSet
    val skewres = Events.typeTransitionsSkewResistantOf(ev)
      .as[(String, String, Long, Long)].collect().toSet
    assert(skewres === plain)
    assert(plain.contains(("click", "purchase", 2L, 1000000L))) // both boundary-crossing
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

  test("attribution: exact-total credit under all three models") {
    val ev = Seq(
      // user 1: view, view, click, then a 10.00 purchase — first=view,
      // last=click; linear over 3 touches: 1000 div 3 = 333 each, the
      // remainder 1 rides the LAST touch's class
      (1L, 1L, "view", ts("2026-01-01 10:00:00"), 0.0),
      (2L, 1L, "view", ts("2026-01-01 11:00:00"), 0.0),
      (3L, 1L, "click", ts("2026-01-01 12:00:00"), 0.0),
      (4L, 1L, "purchase", ts("2026-01-01 13:00:00"), 10.0),
      // user 2: only an out-of-window view (8 days before) — 'direct'
      (5L, 2L, "view", ts("2026-01-01 00:00:00"), 0.0),
      (6L, 2L, "purchase", ts("2026-01-09 00:00:01"), 5.0),
      // user 3: a view AFTER the purchase — no credit, 'direct'
      (7L, 3L, "purchase", ts("2026-01-05 00:00:00"), 2.5),
      (8L, 3L, "view", ts("2026-01-05 00:00:01"), 0.0),
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.attributionOf(ev)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("first", "view")) === ((1000L, 1L)))
    assert(got(("last", "click")) === ((1000L, 1L)))
    assert(got(("linear", "view")) === ((666L, 1L)))  // 2 × 333
    assert(got(("linear", "click")) === ((334L, 1L))) // 333 + remainder 1
    // untouched purchases: 500 + 250 cents direct under every model
    Seq("first", "last", "linear").foreach { m =>
      assert(got((m, "direct")) === ((750L, 2L)), m)
    }
    // every model credits EXACTLY the purchase total
    val totals = got.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._1).sum).toMap
    assert(totals === Map("first" -> 1750L, "last" -> 1750L, "linear" -> 1750L))
  }

  test("MAD anomaly: burst flagged, inliers not, exact integer decision") {
    // type x hourly counts [8, 10, 12, 14, 100]: median 12 (m2=24),
    // residuals sorted [0,2,2,4,88] → MAD 2 (mad4=8); threshold
    // |4c−24|·10⁴ > 44478·8 ⇔ |4c−24| > 35.6 — only the 100 burst trips
    val counts = Seq(8, 10, 12, 14, 100)
    var id = 0L
    val ev = counts.zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map { _ =>
        id += 1
        (id, 1L, "x", ts(f"2026-01-01 ${10 + h}%02d:00:00"))
      }
    }.toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.madAnomalyWindowsOf(ev)
      .as[(String, java.sql.Timestamp, Long, Long, Long)].collect()
    assert(got.length === 1)
    val (tpe, w, n, medMilli, madMilli) = got.head
    assert(tpe === "x")
    assert(w === ts("2026-01-01 14:00:00"))
    assert(n === 100L)
    assert(medMilli === 12000L) // m2·500 = 24·500
    assert(madMilli === 2000L)  // mad4·250 = 8·250
    // degenerate MAD = 0: constant counts + one off-median window —
    // MAD's documented behavior is to flag ANY deviation
    val ev2 = Seq(5, 5, 5, 6).zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map { _ => id += 1
        (id, 1L, "y", ts(f"2026-01-02 ${10 + h}%02d:00:00")) }
    }.toDF("event_id", "user_id", "event_type", "ts")
    val got2 = Events.madAnomalyWindowsOf(ev2)
      .as[(String, java.sql.Timestamp, Long, Long, Long)].collect()
    assert(got2.map(_._3).toSeq === Seq(6L))
  }

  test("lateness advisor: exact buckets for planted out-of-order arrivals") {
    // user 1 arrival order (event_id): t0, t0+100s, then one 7s late,
    // one 130s late — buckets ⌊log2 7⌋ = 2 and ⌊log2 130⌋ = 7
    val ev = Seq(
      (1L, 1L, "click", ts("2026-01-01 10:00:00")),
      (2L, 1L, "click", ts("2026-01-01 10:01:40")),
      (3L, 1L, "click", ts("2026-01-01 10:01:33")),  // 7 s behind run-max
      (4L, 1L, "click", ts("2026-01-01 09:59:30")),  // 130 s behind
      // user 2: in order — both rows bucket -1
      (5L, 2L, "view", ts("2026-01-01 10:00:00")),
      (6L, 2L, "view", ts("2026-01-01 10:00:01")),
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.latenessAdvisorOf(ev)
      .as[(String, Int, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("click", -1, 2L, 0L, 0L, 0L),     // first event + the in-order one
      ("click", 2, 1L, 7L, 4L, 7L),
      ("click", 7, 1L, 130L, 128L, 255L),
      ("view", -1, 2L, 0L, 0L, 0L),
    ))
  }

  test("cohort LTV: weekly cells, exact cents, cumulative curve") {
    val ev = Seq(
      // user 1 signs up Wed Jan 7 (week of Mon Jan 5); buys 1.00 that
      // week and 2.00 two weeks later
      (1L, 1L, "signup", ts("2026-01-07 09:00:00"), 0.0),
      (2L, 1L, "purchase", ts("2026-01-09 10:00:00"), 1.0),
      (3L, 1L, "purchase", ts("2026-01-21 10:00:00"), 2.0),
      // user 2, same cohort week, buys 4.00 in week 2
      (4L, 2L, "signup", ts("2026-01-05 00:00:00"), 0.0),
      (5L, 2L, "purchase", ts("2026-01-22 00:00:00"), 4.0),
      // user 3: purchase but NO signup — excluded entirely
      (6L, 3L, "purchase", ts("2026-01-09 00:00:00"), 99.0),
      // user 4: purchase BEFORE the signup week — excluded by pw >= cw
      (7L, 4L, "purchase", ts("2026-01-01 00:00:00"), 50.0),
      (8L, 4L, "signup", ts("2026-01-14 00:00:00"), 0.0),
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.cohortLtvOf(ev)
      .selectExpr("CAST(cohort_week AS STRING)", "age_weeks", "buyers",
        "revenue_cents", "cum_revenue_cents")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("2026-01-05", 0L, 1L, 100L, 100L),
      ("2026-01-05", 2L, 2L, 600L, 700L),
    ))
  }
}
