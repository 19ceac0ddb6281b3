package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // write the oracle map BEFORE the dumps, not after: if the driver's
    // gate budget expires mid-run and kills this JVM, a trailing write
    // would leave NO oracle_sql.json and the round's correctness artifact
    // silently collapses to {} (r9's gate) — with the map on disk first,
    // every query dumped before the kill still gets compared
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // optional comma-separated subset (iterating one oracle without
    // re-dumping 160 queries); unset/empty = full suite
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          System.err.println(
            f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // cache hygiene: operators may cache shared subtrees (grams,
        // fingerprints) for intra-query reuse — release between queries so
        // no query's storage lingers under the rest of the run
        spark.catalog.clearCache()
      }
    writeSketchBounds(spark, outDir)
    spark.stop()
  }

  /** The two HLL++ queries have no DuckDB twin BY CONSTRUCTION (different
    * register layouts), so the gate records them `no_oracle` — but their
    * estimates CAN be held against their exact twins:
    * |approx − exact| ≤ max(2, 3·rsd·exact) per group (rsd = 0.02, with a
    * 2-count floor where HLL++ sparse mode is near-exact). tools/check.py
    * computes the same bound; this copy ships the verdict WITH the dumped
    * artifacts, so the driver's correctness directory carries the evidence
    * for its two permanent no-oracle rows even when check.py never runs. */
  private def writeSketchBounds(spark: SparkSession, outDir: String): Unit = try {
    val rsd = 0.02
    val tol = 3 * rsd
    def relErr(a: Double, e: Double): Double =
      if (e != 0) math.abs(a - e) / e else if (a == 0) 0.0 else Double.PositiveInfinity
    // worst is a STRING at the call sites: NaN (empty dump) / Infinity
    // (exact=0, approx!=0) are not valid JSON literals, and the file must
    // stay parseable precisely when something went wrong — the check.py
    // twin serializes the same cases as null
    def bound(pairs: Seq[(Double, Double)]): (Int, String, Boolean) = {
      val worst = if (pairs.isEmpty) Double.NaN else pairs.map((relErr _).tupled).max
      val worstJson = if (worst.isNaN || worst.isInfinite) "null" else worst.toString
      val ok = pairs.nonEmpty &&
        pairs.forall { case (a, e) => math.abs(a - e) <= math.max(2.0, tol * e) }
      (pairs.size, worstJson, ok)
    }
    def exists(name: String) = Files.isDirectory(Paths.get(s"$outDir/$name"))
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    if (exists("q25_approx_distinct")) {
      val pairs = spark.read.parquet(s"$outDir/q25_approx_distinct")
        .select("approx_parts", "exact_parts").collect()
        .map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble)).toSeq
      val (n, worst, ok) = bound(pairs)
      entries += s""""q25_approx_distinct":{"groups":$n,"max_rel_err":$worst,"tol":$tol,"ok":$ok}"""
    }
    if (exists("profile_lineitem_approx") && exists("profile_lineitem")) {
      val a = spark.read.parquet(s"$outDir/profile_lineitem_approx")
        .select("column_name", "n_distinct")
      val e = spark.read.parquet(s"$outDir/profile_lineitem")
        .select("column_name", "n_distinct").withColumnRenamed("n_distinct", "exact")
      val pairs = a.join(e, "column_name").select("n_distinct", "exact").collect()
        .map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble)).toSeq
      val (n, worst, ok) = bound(pairs)
      entries += s""""profile_lineitem_approx":{"groups":$n,"max_rel_err":$worst,"tol":$tol,"ok":$ok}"""
    }
    if (entries.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/sketch_bounds.json"),
        entries.mkString("{", ",", "}"))
  } catch { case e: Throwable =>
    System.err.println(s"[verify] sketch bounds failed: ${e.getMessage}")
  }
}
