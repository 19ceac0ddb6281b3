package graft

import org.apache.spark.sql.DataFrame

/** Shared physical-plan census: the AQE-final shuffle/broadcast counts and
  * anti-pattern flags for one query. Two consumers:
  *
  *   - [[PlanDump]] prints it per query for interactive plan review;
  *   - PlanCensusSpec asserts it against a committed golden file, so an
  *     edit that adds an Exchange or flips a join strategy fails a TEST
  *     instead of surfacing as a bench regression two rounds later.
  */
object PlanCensus {

  /** Per-query plan census. `shuffles` counts shuffle `Exchange` nodes
    * (BroadcastExchange is counted separately), both from the final
    * (post-AQE) plan section only — the initial plan legitimately differs
    * once AQE re-plans joins at runtime. */
  case class Census(shuffles: Int, broadcasts: Int, flags: Seq[String]) {
    def line(name: String): String = s"$name $shuffles $broadcasts" +
      (if (flags.isEmpty) "" else flags.mkString(" [", ",", "]"))
  }

  /** Execute the query (noop sink — AQE only finalizes the plan after a
    * run) and census the formatted physical plan. Returns the census and
    * the full plan text. */
  def of(df: DataFrame): (Census, String) = {
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val nEx = raw"\(\d+\) Exchange\b".r.findAllIn(finalPlan).length
    val nBc = raw"\(\d+\) BroadcastExchange\b".r.findAllIn(finalPlan).length
    val flags = Seq(
      "CartesianProduct" -> plan.contains("CartesianProduct"),
      "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
      // a >400-char ReadSchema means a scan reads (nearly) every column —
      // projection pruning failed
      "full-width-scan" ->
        "ReadSchema: struct<[^>]{400,}".r.findFirstIn(plan).isDefined,
      // driver-materialized data parallelized back out, or a legit
      // localCheckpoint lineage cut — review which on every new hit
      "ExistingRDD" -> plan.contains("Scan ExistingRDD"),
    ).collect { case (f, true) => f }
    (Census(nEx, nBc, flags), plan)
  }
}
