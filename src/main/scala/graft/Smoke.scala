package graft

import org.apache.spark.sql.SparkSession

/** Drives the driver's smoke path: SparkEntry.entry(spark) must return >0
  * rows on sf0.001. Also prints the formatted plan of the flagship query so
  * plan regressions (lost pushdown / broadcast) are visible per run. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0, "entry must return rows")
    println("[smoke] OK")
    spark.stop()
  }
}
