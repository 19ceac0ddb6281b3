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
    // flags AND counts both read the AQE-final section only: a node AQE
    // replaced at runtime (e.g. a sort-merge join flipped to broadcast)
    // must not be flagged as present
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val nEx = raw"\(\d+\) Exchange\b".r.findAllIn(finalPlan).length
    val nBc = raw"\(\d+\) BroadcastExchange\b".r.findAllIn(finalPlan).length
    val flags = Seq(
      "CartesianProduct" -> finalPlan.contains("CartesianProduct"),
      "BroadcastNestedLoopJoin" -> finalPlan.contains("BroadcastNestedLoopJoin"),
      // a >400-char ReadSchema means a scan reads (nearly) every column —
      // projection pruning failed
      "full-width-scan" ->
        "ReadSchema: struct<[^>]{400,}".r.findFirstIn(finalPlan).isDefined,
      // driver-materialized data parallelized back out, or a legit
      // localCheckpoint lineage cut — review which on every new hit
      "ExistingRDD" -> finalPlan.contains("Scan ExistingRDD"),
    ).collect { case (f, true) => f }
    (Census(nEx, nBc, flags), plan)
  }

  /** Queries ALLOWED to carry an anti-pattern flag, each with its
    * justification — the explicit exemption list. PlanCensusSpec fails on
    * any flagged query not listed here (so a new cartesian/BNLJ can't slip
    * in via a blind golden regeneration) and on any stale exemption. */
  val exemptFlags: Map[String, Map[String, String]] = Map(
    "ann_brute_topk" -> Map("BroadcastNestedLoopJoin" ->
      "brute force BY DESIGN: broadcast side is NumQueries rows; every corpus vector scores against each"),
    "dedup_embedding_cosine" -> Map("BroadcastNestedLoopJoin" ->
      "exact all-pairs verifier, bounded-N by contract; the scale path is Similarity.annLshTopK candidates + rerank"),
    "curation_pipeline" -> Map("ExistingRDD" ->
      "localCheckpoint lineage cuts inside the star-contraction fixpoint loop"),
    "dedup_clusters" -> Map("ExistingRDD" ->
      "localCheckpoint lineage cuts inside the star-contraction fixpoint loop"),
    "dedup_keep_list" -> Map("ExistingRDD" ->
      "localCheckpoint lineage cuts inside the star-contraction fixpoint loop"),
    "text_tfidf_top_terms" -> Map("BroadcastNestedLoopJoin" ->
      "crossJoin(broadcast(single-row N aggregate)) — the scalar-subquery shape; build side is exactly 1 row"),
  )
}
