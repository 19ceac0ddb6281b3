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

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * only reads as a raw long (`spark.sql.legacy.parquet.nanosAsLong=true`,
    * set by [[sessionDefaults]]). Convert ns → µs by integer division —
    * truncation, exactly what DuckDB does reading the same file — and
    * restore TimestampType. `div` not `/`: epoch-nanos ≈ 1.7e18 exceeds
    * double's 2^53 integer range, so float division would corrupt low bits.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df

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
