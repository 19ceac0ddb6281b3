// Shim package: Dataset.ofRows and the execution internals used here are
// private[sql]; see Expressions.scala for rationale.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan => LP}

/** Custom whole-operator: top-k rows per key with rank — the semantics of
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k` without the
  * window operator's full sort of every key group.
  *
  * Why a custom operator (SURVEY.md §7.3 ladder, step c): Spark plans the
  * row_number+filter idiom as Exchange → full Sort of every group → Window
  * scan. For small k over large groups the sort is wasted work and memory;
  * the right physical shape is one bounded heap (size k) per key —
  * O(n log k) time, O(keys·k) memory, no sort buffer to spill. That shape
  * is not expressible by composing built-ins, hence a LogicalPlan node, a
  * SparkStrategy, and an ExecNode, wired via `experimental.extraStrategies`
  * / [[GraftExtensions]].
  *
  * Correctness is gated two ways: TopKSpec asserts equality with the window
  * idiom, and the driver's DuckDB oracle compares `q07b_topk_custom`
  * against the same SQL as q07.
  */
case class TopKPerKeyPlan(groupingKeys: Seq[Expression], sortOrder: Seq[SortOrder],
                          k: Int, rankAttr: AttributeReference, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"k must be positive: $k")
  // rankAttr is a constructor param, NOT a val: plan copies (resolution,
  // optimization) must preserve its exprId or downstream references break
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Optimizer rule: rewrites the standard top-k idiom
  * `Filter(rank <= k, Window(row_number() over (partition ... order ...)))`
  * into [[TopKPerKeyPlan]] — users keep writing the window form and get the
  * bounded-heap operator automatically. Deliberately conservative: fires
  * only on a single row_number window expression with a plain `<`/`<=`
  * literal bound on exactly that attribute. */
object RewriteRowNumberTopK
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window, WindowGroupLimit}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
          _, _, child, _)) =>
      val rankAttr = a.toAttribute
      val bound = cond match {
        case LessThanOrEqual(r: Attribute, Literal(k: Int, IntegerType))
          if r.exprId == rankAttr.exprId => Some(k)
        case LessThan(r: Attribute, Literal(k: Int, IntegerType))
          if r.exprId == rankAttr.exprId => Some(k - 1)
        case _ => None
      }
      bound match {
        case Some(k) if k > 0 && orderSpec.nonEmpty =>
          // Spark's InferWindowGroupLimit may already have inserted a
          // WindowGroupLimit (sort + per-group limit) under the Window —
          // redundant below the heap operator, and its required sort is
          // exactly the work this rewrite removes; strip it
          val input = child match {
            case WindowGroupLimit(p, o, _, _, grandChild)
              if p == partitionSpec && o == orderSpec => grandChild
            case other => other
          }
          TopKPerKeyPlan(partitionSpec, orderSpec, k,
            rankAttr.asInstanceOf[AttributeReference], input)
        case _ => f
      }
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: TopKPerKeyPlan =>
      TopKPerKeyExec(p.groupingKeys, p.sortOrder, p.k, p.rankAttr,
        planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(groupingKeys: Seq[Expression], sortOrder: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  /** Same key → same partition; Spark inserts the hash Exchange. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupingKeys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupingKeys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = groupingKeys
    val order = sortOrder
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(order, childOutput)
      // per-key bounded heap; heap head = current worst of the kept k
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(rowOrdering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrdering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val out = UnsafeProjection.create(output, output)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val ascending = heap.dequeueAll.reverseIterator // best rank first
        ascending.zipWithIndex.map { case (row, i) =>
          rankRow.setInt(0, i + 1)
          out(joined(row, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKOps {
  /** `topKPerKey(df, keys, orderBy, k)` ≡ window row_number ≤ k with a rank
    * column appended. `orderBy` columns may carry `.desc`/`.asc`. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column],
                 k: Int, rankName: String = "rank"): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    // session.expression eagerly converts the ColumnNode; the lazy
    // ExpressionUtils wrapper reports resolved but cannot evaluate
    val toExpr: Column => Expression = c => ds.sparkSession.expression(c)
    val sortOrders = orderBy.map { c =>
      toExpr(c) match {
        case so: SortOrder => so
        case e             => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession,
      TopKPerKeyPlan(keys.map(toExpr), sortOrders, k, rankAttr, ds.logicalPlan))
  }
}
