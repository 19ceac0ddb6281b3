package org.apache.spark.sql.graft

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Executed-plan walker behind [[graft.PlanCensus]]: counts shuffle /
  * broadcast exchanges and anti-pattern nodes by traversing the ACTUAL
  * `SparkPlan` tree — descending through AQE (`executedPlan` of each
  * `AdaptiveSparkPlanExec`), materialized query stages, cached subtrees
  * (`InMemoryTableScanExec → relation.cachedPlan`, each distinct CACHED
  * COMPUTATION once — keyed by cacheBuilder, since relation instances are
  * fresh copies per scan), and subquery plans.
  *
  * Replaces a regex census over `explain("formatted")` text, which broke
  * the moment a cached subtree nested its own `== Initial Plan ==` marker
  * inside the tree (the section split truncated everything after it,
  * reporting 0 exchanges for a 7-shuffle plan). Node classes here are
  * `private[sql]`-adjacent — hence this file lives in the shim package.
  */
object PlanWalk {

  final case class Counts(shuffles: Int, broadcasts: Int,
                          cartesian: Boolean, bnlj: Boolean,
                          existingRdd: Boolean, fullWidthScan: Boolean,
                          bnljCount: Int, singlePartWindow: Boolean = false)

  def countsOf(root: SparkPlan): Counts = {
    var sh = 0; var bc = 0; var bnljN = 0
    var cart = false; var rdd = false; var wide = false; var spw = false
    val seenCaches = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case _: ReusedExchangeExec    => () // reuse marker: counted at origin
        case _: ReusedSubqueryExec    => () // likewise for shared subqueries
        case s: ShuffleExchangeLike   => sh += 1; s.children.foreach(walk)
        case b: BroadcastExchangeLike => bc += 1; b.children.foreach(walk)
        case c: InMemoryTableScanExec =>
          // key on cacheBuilder, not the relation: the CacheManager hands
          // each scan a fresh InMemoryRelation copy (withOutput), so the
          // relation instance never repeats while the underlying cached
          // computation (and its exchanges, built once) does
          if (seenCaches.add(c.relation.cacheBuilder))
            walk(c.relation.cachedPlan)
        case f: FileSourceScanExec =>
          // a ~400-char ReadSchema means the scan reads (nearly) every
          // column — projection pruning failed
          if (f.requiredSchema.catalogString.length >= 400) wide = true
        case other =>
          other match {
            case _: CartesianProductExec        => cart = true
            case _: BroadcastNestedLoopJoinExec => bnljN += 1
            case _: RDDScanExec                 => rdd = true
            // an EMPTY window partition spec moves the whole input to one
            // partition at runtime ("Moving all data to a single partition"
            // — WindowExec's own warning). Catalyst FOLDS constant specs
            // like partitionBy(lit(1)) down to empty, so the authoring
            // mistake is invisible in source review; the executed plan is
            // where it shows (found on mixWeights, r6 judge)
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.isEmpty => spw = true
            case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
                if w.partitionSpec.isEmpty => spw = true
            case _                              => ()
          }
          other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(root)
    Counts(sh, bc, cart, bnljN > 0, rdd, wide, bnljN, spw)
  }

  /** The build-side subtree of every BroadcastNestedLoopJoin in the tree
    * (AQE/stages descended) — lets a spec assert each one is the benign
    * 1-row scalar-subquery shape rather than exempting a query wholesale. */
  def bnljBuildPlans(root: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val out = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case j: BroadcastNestedLoopJoinExec =>
          out += (j.buildSide match {
            case BuildLeft  => j.left
            case BuildRight => j.right
          })
          j.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(root)
    out.toSeq
  }

  /** True iff the subtree aggregates to exactly one row: some aggregate
    * node with NO grouping expressions (the scalar-subquery build shape). */
  def isSingleRowAggregate(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => isSingleRowAggregate(a.executedPlan)
    case q: QueryStageExec        => isSingleRowAggregate(q.plan)
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      a.groupingExpressions.isEmpty || a.children.exists(isSingleRowAggregate)
    case other => other.children.exists(isSingleRowAggregate)
  }
}
