package graft

import graft.operators.AsOf

/** As-of join semantics vs a straightforward in-memory recomputation. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("purchase-to-last-view matches in-memory as-of semantics") {
    val events = graft.core.Tables.events(spark, sf)
      .select($"event_id", $"ts".cast("long").as("ts_s"), $"user_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    // full-precision ordering key: (ts, side, event_id) like the operator
    val eventsFull = graft.core.Tables.events(spark, sf)
      .selectExpr("event_id", "unix_micros(ts) as tus", "user_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
    val byUser = eventsFull.groupBy(_._3)
    val expected = byUser.values.flatMap { es =>
      val views = es.filter(_._4 == "view").sortBy(e => (e._2, e._1))
      es.filter(_._4 == "purchase").map { p =>
        val prior = views.filter(v => v._2 < p._2 ||
          (v._2 == p._2)) // rights-first at equal ts
        val matched = if (prior.isEmpty) None else Some(prior.last._1)
        (p._1, matched)
      }
    }.toMap
    val got = AsOf.purchaseToLastView(spark, sf)
      .select($"purchase_id", $"view_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got.size === expected.size)
    assert(got === expected)
    // sanity: some purchases have no prior view (nulls preserved)
    assert(got.values.exists(_.isEmpty) || got.values.forall(_.nonEmpty))
  }

  test("forward as-of: earliest at-or-after view, smallest id on ties, null past the end") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: P100 at 10:00 — views before (1), at (2), and after (3):
      // the equal-ts view matches
      (1L, 1L, "view", ts("2026-01-01 09:59:00")),
      (2L, 1L, "view", ts("2026-01-01 10:00:00")),
      (3L, 1L, "view", ts("2026-01-01 10:05:00")),
      (100L, 1L, "purchase", ts("2026-01-01 10:00:00")),
      // P101 at 10:03 — two equal-ts future views: smallest id wins
      (4L, 1L, "view", ts("2026-01-01 10:05:00")),
      (101L, 1L, "purchase", ts("2026-01-01 10:03:00")),
      // user 2: only a PRIOR view — forward match is null
      (5L, 2L, "view", ts("2026-01-01 09:00:00")),
      (102L, 2L, "purchase", ts("2026-01-01 10:00:00")),
    ).toDF("event_id", "user_id", "event_type", "ts")
    // route through a temp dir so the public entry point is what's tested
    val dir = java.nio.file.Files.createTempDirectory("graft_asof").toString
    ev.write.parquet(s"$dir/events.parquet")
    val got = AsOf.purchaseToNextView(spark, dir)
      .select($"purchase_id", $"view_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      100L -> Some(2L),  // equal-ts view matches forward
      101L -> Some(3L),  // ties at 10:05 → smallest view id
      102L -> None,      // nothing at-or-after
    ))
  }
}
