package graft

import org.apache.spark.sql.functions._

/** Source/sink round-trips beyond parquet: csv, json, text — the engine's
  * ingestion surface (the reference ingests only line-text; these are the
  * formats a Spark user replaces it with). */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_src").toString

  private lazy val sample = graft.core.Tables.customer(spark, sf)

  test("csv round-trip preserves rows (header + inferSchema)") {
    val dir = tmp() + "/c.csv"
    sample.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() === sample.count())
    assert(back.columns.toSet === sample.columns.toSet)
    val a = sample.select($"c_custkey", $"c_name").as[(Long, String)].collect().toSet
    val b = back.select($"c_custkey".cast("long"), $"c_name").as[(Long, String)].collect().toSet
    assert(a === b)
  }

  test("json lines round-trip preserves rows and nested structs") {
    val dir = tmp() + "/j.json"
    val nested = sample.select($"c_custkey",
      struct($"c_name", $"c_mktsegment").as("info"))
    nested.write.json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === sample.count())
    val a = nested.select($"c_custkey", $"info.c_name").as[(Long, String)].collect().toSet
    val b = back.select($"c_custkey", $"info.c_name").as[(Long, String)].collect().toSet
    assert(a === b)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp() + "/p.parquet"
    sample.write.partitionBy("c_mktsegment").parquet(dir)
    val one = spark.read.parquet(dir).filter($"c_mktsegment" === "BUILDING")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    // partition filter must appear as PartitionFilters, not a data Filter
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)].*", "$1")
        .contains("c_mktsegment"), plan)
  }
}
