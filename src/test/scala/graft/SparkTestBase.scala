package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session — per-suite
  * sessions would pay ~5 s startup each). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val builder = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkTestBase extends AnyFunSuite {
  // lazy val (not def): `import spark.implicits._` needs a stable identifier
  protected lazy val spark: SparkSession = SparkTestBase.spark
  protected def sf: String = SparkTestBase.sf
}
