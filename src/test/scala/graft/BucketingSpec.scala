package graft

import org.apache.spark.sql.functions._

/** Bucketing for co-located joins — the 100 TB shuffle-elimination
  * technique: two tables bucketed by the join key join with NO Exchange
  * (each bucket pair joins locally). */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without a shuffle") {
    val o = graft.core.Tables.orders(spark, sf)
    val li = graft.core.Tables.lineitem(spark, sf)
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    // a dropped-from-catalog table can leave its managed location behind
    // (e.g. interrupted prior run) — saveAsTable then refuses the name
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("graft_orders_b", "graft_lineitem_b").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast join
    val joined = spark.table("graft_lineitem_b")
      .join(spark.table("graft_orders_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(round(sum($"l_extendedprice"), 2).as("rev"))
    joined.collect()
    // AQE's toString prints Final AND Initial plans — count only the final
    val full = joined.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==")(0)

    // the join itself must not exchange either side: bucket layout IS the
    // required distribution (only the final aggregation may shuffle)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected at most the post-join agg exchange:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // and values equal the unbucketed join
    val expected = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(round(sum($"l_extendedprice"), 2).as("rev"))
      .as[(String, Double)].collect().toSet
    val got = joined.as[(String, Double)].collect().toSet
    assert(got === expected)
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
  }
}
