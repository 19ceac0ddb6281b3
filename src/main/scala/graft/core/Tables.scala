package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * The reference engine's only source is a replicated line-oriented file
  * store ("SDFS", reference `src/SDFSServer.java`); here the source layer is
  * Spark's `FileSourceScanExec` over parquet — columnar, splittable,
  * predicate-pushdown-capable — which is the 100 TB-safe replacement
  * (SURVEY.md §1.4). All queries take the scale-factor directory as a
  * parameter so the same code runs sf0.001 → sf100.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The events table has shipped `ts` in two physical forms across driver
    * testdata generations: parquet TIMESTAMP(NANOS), which Spark only reads
    * as a raw long (`spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[sessionDefaults]]), and parquet TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ. Normalize
    * both to session-local TimestampType at µs precision — identical values
    * either way (the session timezone is pinned UTC, so the NTZ cast is a
    * relabel, not a clock shift; DuckDB reads the same µs wall times):
    *  - ns long → `timestamp_micros(ts div 1000)` — truncation, exactly
    *    what DuckDB does reading the same file. `div` not `/`: epoch-nanos
    *    ≈ 1.7e18 exceeds double's 2^53 integer range, so float division
    *    would corrupt low bits.
    *  - TIMESTAMP_NTZ → cast to TimestampType. */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Session configs every graft session needs (Verify, Bench, tests). */
  val sessionDefaults: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
