package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-audit tool: dumps the formatted physical plan of every SparkEntry
  * query to one file and prints a summary of plan anti-patterns
  * (cartesian products, unexpected sort-merge joins of tiny dims, scans
  * without column pruning). Review target/plans.txt after operator work —
  * a correct result with the wrong plan is a scale bug. */
object PlanDump {
  /** args: [sfDir] [queryName...] — with names given, dumps only those
    * queries (and times each execution, n=2, min), at bench parallelism. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", if (only.isEmpty) "8" else "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    graft.core.Tables.envExtraConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val sb = new StringBuilder
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    qs.foreach { case (name, fn) =>
      try {
        // PlanCensus executes via the noop sink first: AQE only finalizes
        // the plan (broadcast conversions, coalesced shuffles) after a run.
        // Timing runs only in named mode (n=2, min) — the full-suite dump
        // is a plan audit, not a benchmark, and must not double-execute
        // ~70 queries for an n=1 number Bench would measure properly.
        val times = if (only.isEmpty) Seq.empty else (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        val (census, plan) = PlanCensus.of(fn(spark, sfDir))
        sb.append(s"===== $name =====\n$plan\n")
        val timing = if (times.isEmpty) "" else f"min=${times.min}%.2fs  "
        println(f"[plan] $name%-28s ${census.shuffles}x shuffle " +
          s"${census.broadcasts}x broadcast  $timing" +
          (if (census.flags.isEmpty) "ok" else census.flags.mkString(", ")))
      } catch { case e: Throwable =>
        println(s"[plan] $name FAILED: ${e.getMessage.take(100)}")
      } finally spark.catalog.clearCache()
    }
    Files.writeString(Paths.get("target/plans.txt"), sb.toString)
    spark.stop()
  }
}
