package graft

import graft.operators.Relational

/** Physical-plan assertions: the scale properties (pushdown, pruning,
  * broadcast, partial aggregation, top-k without global sort) must hold —
  * a correct result with the wrong plan is a 100 TB bug. */
class PlanSpec extends SparkTestBase {

  // formatted mode prints untruncated PushedFilters/ReadSchema; run the
  // query first so AQE's final plan (not the initial placeholder) is shown
  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02: filters are pushed to the parquet scan and columns pruned") {
    val p = planOf(Relational.q02FilterProject(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
    // only the 5 needed columns are read (4 output + shipdate filter)
    val read = "ReadSchema: struct<([^>\n]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(read.split(",").length <= 5, read)
    assert(!read.contains("l_extendedprice"), read)
  }

  /** Final (post-AQE) plan section only: with the forced broadcast hints
    * removed from SF-proportional sides, the INITIAL plan legitimately
    * contains SortMergeJoin — AQE's runtime size check converts it. */
  private def finalPlanOf(df: org.apache.spark.sql.DataFrame): String =
    planOf(df).split("== Initial Plan ==")(0)

  test("q03: dimension joins are broadcast, no shuffle of nation/customer") {
    // customer carries NO broadcast() hint (SF-proportional: forced
    // broadcast = OOM at 100 TB); AQE's size check picks BroadcastHashJoin
    // here and degrades to a shuffle join at scale instead of failing
    val p = finalPlanOf(Relational.q03RevenueByNation(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q14/q18/q19: unhinted SF-proportional sides still broadcast at test scale via AQE") {
    // the hint removal must not regress bench-scale plans: AQE's runtime
    // size check re-plans each of these to BroadcastHashJoin; at 100 TB the
    // same code degrades to shuffle joins (no OOM) because no hint forces it
    for (q <- Seq(Relational.q14SupplierRevenue _,
                  Relational.q18AboveAverageOrders _,
                  Relational.q19RegionalRevenue _)) {
      val p = finalPlanOf(q(spark, sf))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }
  }

  test("q01: aggregation is two-phase (map-side partial)") {
    val p = planOf(Relational.q01PricingSummary(spark, sf))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q05: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf(Relational.q05TopOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("as-of join: no nested loop, single hash exchange on the key") {
    val p = planOf(graft.operators.AsOf.purchaseToLastView(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    assert("Exchange hashpartitioning".r.findAllIn(
      p.split("== Initial Plan ==")(0)).length <= 1, p)
  }

  test("range join: equi-join on (user, bin), no nested loop") {
    val p = planOf(graft.operators.RangeJoin.errorsNearClicks(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q01 whole-stage codegen covers the aggregate") {
    // formatted explain marks codegen'd operators with a leading '*'
    val p = planOf(Relational.q01PricingSummary(spark, sf))
    assert(p.contains("* HashAggregate"), p)
  }

  test("embedding cosine pairs: Spark-managed broadcast, no driver-fed scan") {
    val p = planOf(graft.operators.Dedup.embeddingPairs(spark, sf))
    // the build side must be a Spark BroadcastExchange (the operator's
    // deliberate bounded-N shape), never driver-collected data fed back
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("LocalTableScan"), p)
  }

  test("winnow near-dup pairs: candidate generation is an equi-join on the fingerprint") {
    val df = graft.operators.TextOps.winnowCandidates(spark, sf)
    df.write.mode("overwrite").format("noop").save() // AQE-finalize
    // NestedLoops ARE expected here — but ONLY the crossJoin(broadcast(
    // 1-row ndocs aggregate)) that folds the df-cap into the plan (the
    // scalar-subquery shape, replicated into each branch that consumes
    // the capped index). Checking every BNLJ's BUILD SIDE on the tree
    // (not the explain text, which repeats nodes across AQE sections)
    // keeps the guard: a genuine quadratic BNLJ (e.g. a candidate
    // self-join that lost its fingerprint key) has a non-single-row
    // build and fails here instead of hiding under the per-query
    // census exemption
    import org.apache.spark.sql.graft.PlanWalk
    val c = PlanWalk.countsOf(df.queryExecution.executedPlan)
    assert(!c.cartesian)
    val builds = PlanWalk.bnljBuildPlans(df.queryExecution.executedPlan)
    assert(builds.nonEmpty)
    builds.foreach(b =>
      assert(PlanWalk.isSingleRowAggregate(b), s"non-scalar BNLJ build:\n$b"))
    val p = planOf(graft.operators.TextOps.winnowCandidates(spark, sf))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("minhash LSH pairs: candidate generation is an equi-join on the bucket") {
    val p = planOf(graft.operators.Dedup.minhashLshPairs(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }
}
