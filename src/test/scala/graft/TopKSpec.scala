package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, TopKOps}
import graft.operators.Relational

/** Custom TopKPerKey operator (LogicalPlan + Strategy + ExecNode) must
  * equal the window row_number idiom it replaces. */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def register(): Unit = GraftFunctions.register(spark)

  test("topKPerKey equals window row_number <= k on orders") {
    register()
    val o = graft.core.Tables.orders(spark, sf)
    val custom = TopKOps.topKPerKey(o,
        keys = Seq($"o_custkey"),
        orderBy = Seq($"o_orderdate".desc, $"o_orderkey".desc),
        k = 3, rankName = "rn")
      .select($"o_custkey", $"o_orderkey", $"rn")
      .as[(Long, Long, Int)].collect().toSet
    val window = Relational.q07LatestOrdersPerCustomer(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    assert(custom === window)
  }

  test("topKPerKey handles k larger than group size and empty keys") {
    register()
    val df = Seq(("a", 3), ("a", 1), ("b", 2)).toDF("k", "v")
    val r = TopKOps.topKPerKey(df, Seq($"k"), Seq($"v".asc), k = 10)
      .select($"k", $"v", $"rank").as[(String, Int, Int)].collect().toSet
    assert(r === Set(("a", 1, 1), ("a", 3, 2), ("b", 2, 1)))
    // global top-k: no keys → AllTuples distribution
    val g = TopKOps.topKPerKey(df, Seq.empty, Seq($"v".desc), k = 2)
      .select($"v", $"rank").as[(Int, Int)].collect().toSet
    assert(g === Set((3, 1), (2, 2)))
  }

  test("optimizer rule rewrites the window row_number idiom to TopKPerKey automatically") {
    register()
    import org.apache.spark.sql.expressions.{Window => W}
    val o = graft.core.Tables.orders(spark, sf)
    val idiom = o.withColumn("rn", row_number().over(
        W.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rn")
    idiom.collect()
    val plan = idiom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window ["), plan)          // no window operator
    assert(!plan.contains("WindowGroupLimit"), plan)  // its sort+limit stripped
    assert(!plan.contains("Sort "), plan)             // heap path needs no sort
    // and the rewrite preserves results exactly
    val direct = TopKOps.topKPerKey(o, Seq($"o_custkey"),
        Seq($"o_orderdate".desc, $"o_orderkey".desc), 3, "rn")
      .select($"o_custkey", $"o_orderkey", $"rn")
      .as[(Long, Long, Int)].collect().toSet
    assert(idiom.as[(Long, Long, Int)].collect().toSet === direct)
  }

  test("rule does NOT fire on rank-bound conditions it can't prove (other windows untouched)") {
    register()
    import org.apache.spark.sql.expressions.{Window => W}
    val e = graft.core.Tables.events(spark, sf)
    // lag/sum windows must keep planning as Window
    val running = e.withColumn("rv",
        sum($"value").over(W.partitionBy($"user_id").orderBy($"ts")
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
    running.collect()
    assert(running.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("physical plan uses TopKPerKeyExec with a single hash exchange, no sort") {
    register()
    val o = graft.core.Tables.orders(spark, sf)
    val df = TopKOps.topKPerKey(o, Seq($"o_custkey"),
      Seq($"o_orderdate".desc, $"o_orderkey".desc), k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan) // nodeName strips the Exec suffix
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
  }
}
