package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-audit tool: dumps the formatted physical plan of every SparkEntry
  * query to one file and prints a summary of plan anti-patterns
  * (cartesian products, unexpected sort-merge joins of tiny dims, scans
  * without column pruning). Review target/plans.txt after operator work —
  * a correct result with the wrong plan is a scale bug. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // execute first: AQE only finalizes the plan (broadcast
        // conversions, coalesced shuffles) after a run — explaining an
        // unexecuted query would audit the pre-AQE placeholder
        df.write.mode("overwrite").format("noop").save()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        sb.append(s"===== $name =====\n$plan\n")
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "full-width scan (no pruning)" ->
            "ReadSchema: struct<[^>]{400,}".r.findFirstIn(plan).isDefined,
          // a Scan ExistingRDD is either driver-materialized data
          // parallelized back out (collect + parallelize — the driver heap
          // becomes the scale limit) or a legit localCheckpoint boundary
          // (executor-resident, e.g. dedup_clusters' per-round cut) —
          // review which on every new hit
          "Scan ExistingRDD (driver-fed? or checkpoint)" ->
            plan.contains("Scan ExistingRDD"),
        ).collect { case (f, true) => f }
        // shuffle/broadcast census of the AQE-final plan — the number to
        // re-check after any operator change ("did I add a shuffle?")
        val finalPlan = plan.split("== Initial Plan ==")(0)
        val nEx = raw"\(\d+\) Exchange\b".r.findAllIn(finalPlan).length
        val nBc = raw"\(\d+\) BroadcastExchange\b".r.findAllIn(finalPlan).length
        println(f"[plan] $name%-28s ${nEx}x shuffle ${nBc}x broadcast  " +
          (if (flags.isEmpty) "ok" else flags.mkString(", ")))
      } catch { case e: Throwable =>
        println(s"[plan] $name FAILED: ${e.getMessage.take(100)}")
      }
    }
    Files.writeString(Paths.get("target/plans.txt"), sb.toString)
    spark.stop()
  }
}
