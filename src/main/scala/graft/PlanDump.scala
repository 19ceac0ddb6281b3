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
        // PlanCensus executes via the noop sink first: AQE only finalizes
        // the plan (broadcast conversions, coalesced shuffles) after a run
        val (census, plan) = PlanCensus.of(fn(spark, sfDir))
        sb.append(s"===== $name =====\n$plan\n")
        println(f"[plan] $name%-28s ${census.shuffles}x shuffle " +
          s"${census.broadcasts}x broadcast  " +
          (if (census.flags.isEmpty) "ok" else census.flags.mkString(", ")))
      } catch { case e: Throwable =>
        println(s"[plan] $name FAILED: ${e.getMessage.take(100)}")
      }
    }
    Files.writeString(Paths.get("target/plans.txt"), sb.toString)
    spark.stop()
  }
}
