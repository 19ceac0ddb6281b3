package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    // warmup: touch every table + one shuffle so JIT/codegen/file-listing
    // costs don't land on whichever query happens to run first
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => }
    }
    try graft.core.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => }
    // n repeats per query, report the min — a single run at n=1 let a stray
    // GC/JIT pause land on one query (q17 showed 22 s for a 0.2 MB
    // projection in round 1; re-measured at ~0.5 s)
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    // optional comma-separated query filter (scale rehearsals bench a
    // headline subset; unset OR EMPTY = the full suite — an empty/typo'd
    // filter must never silently produce a plausible-looking empty artifact
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(unknown =>
      System.err.println(s"[bench] WARNING: SPARK_GRAFT_BENCH_ONLY names " +
        s"unknown query '$unknown' — ignored")))
    // a series is only trustworthy if its runs AGREE — a 3x max/min spread
    // means co-tenant noise / GC landed on this query (round 2 committed an
    // 8.5 s min for a 0.3 s query; round 6 committed FOUR queries at 7-29x
    // their true cost with max_dispersion 9.32 — its warning was printed
    // and ignored, so the guard now ACTS instead of warning)
    // the 0.5 s absolute floor keeps pure JIT/GC flutter on sub-100ms
    // queries from triggering (a lone 0.4 s outlier on a 0.09 s query
    // cannot have corrupted the min) while still catching sub-second
    // queries whose runs disagree by enough to matter — the r6 corruption
    // class included 0.2 s queries committed at ~0.9 s
    def dispersed(ts: Seq[Double]): Boolean =
      ts.nonEmpty && ts.min > 0 && ts.max / ts.min > 3.0 && ts.max - ts.min > 0.5
    // only SUCCESSFUL runs may contribute — a failed run's fast abort
    // must never report as a fast query; a fully-failed query reports
    // -1 and is listed in "failed"
    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Seq[Double] = {
      val times = (1 to n).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop sink: computes every output column (a count() would let
        // Catalyst prune the aggregates being benchmarked)
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      // release operator-level caches (grams/fingerprints) between
      // queries: repeats above keep the intra-query steady-state benefit,
      // but no query's storage lingers under the rest of the suite
      spark.catalog.clearCache()
      times
    }
    val maxRetries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        // auto-retry: a dispersed series is re-measured with a FRESH n-run
        // series (up to maxRetries); the accepted series is the one whose
        // runs agree best (lowest max/min; tie -> lowest min), so the
        // committed min is always backed by a mutually-consistent series
        // rather than one lucky (or unlucky) outlier
        var best = measure(name, fn)
        var retries = 0
        while (dispersed(best) && retries < maxRetries) {
          System.err.println(
            f"[bench] $name dispersion ${best.max / best.min}%.1fx " +
              f"(min ${best.min}%.2fs max ${best.max}%.2fs) — retrying " +
              s"(${retries + 1}/$maxRetries)")
          val fresh = measure(name, fn)
          if (fresh.nonEmpty) {
            val (fr, br) = (fresh.max / fresh.min, best.max / best.min)
            if (fr < br || (fr == br && fresh.min < best.min)) best = fresh
          }
          retries += 1
        }
        (name, best, retries)
      }
    results.foreach { case (name, ts, _) =>
      if (dispersed(ts))
        System.err.println(
          f"[bench] WARNING: $name STILL dispersed ${ts.max / ts.min}%.1fx after " +
            f"$maxRetries retries (min ${ts.min}%.2fs max ${ts.max}%.2fs) — " +
            "environment noise persists; do NOT commit this artifact")
    }
    val qs = results.map { case (k, ts, _) =>
      s"\"" + k + "\":" + (if (ts.nonEmpty) ts.min else -1.0)
    }.mkString("{", ",", "}")
    // per-query {min,max,n_ok,retries}: makes cross-run dispersion visible
    // in the committed artifact itself (min alone hides that ALL runs were
    // slow, and retries shows where the guard had to intervene)
    val spread = results.map { case (k, ts, r) =>
      val (mn, mx) = if (ts.nonEmpty) (ts.min, ts.max) else (-1.0, -1.0)
      s"\"$k\":{\"min\":$mn,\"max\":$mx,\"n_ok\":${ts.length},\"retries\":$r}"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, ts, _) if ts.isEmpty => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, ts, _) if ts.nonEmpty => ts.min }.sum
    // locale-proof rounding: Double.toString always uses '.', where the f
    // interpolator follows the default locale and can emit ',' — invalid JSON
    //
    // max_dispersion reports the SAME quantity the retry guard acts on:
    // ratio counts only when the absolute spread exceeds the 0.5 s floor.
    // A 0.09 s min with one 0.4 s outlier run is a 4x ratio but pure
    // JIT/GC flutter — it cannot have corrupted the committed min, and
    // headlining it would make every artifact read "noisy" while the
    // actionable signal (a min that might itself be inflated) drowned.
    // The full per-query min/max series stays visible in "spread"
    // regardless. (Limit worth stating: if EVERY run of a query lands
    // equally inflated, no intra-series metric can see it — that case is
    // covered by cross-round comparison of per-query minima, which is why
    // the artifact keeps them.)
    val maxDisp = math.round(results.collect {
      case (_, ts, _) if ts.nonEmpty && ts.min > 0 && ts.max - ts.min > 0.5 =>
        ts.max / ts.min
    }.foldLeft(1.0)(math.max) * 100) / 100.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","n":$n,"queries":$qs,"spread":$spread,"max_dispersion":$maxDisp,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // bare copy without sbt's [info] log prefix, for log-scrape-free parsing
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), line)
    catch { case _: Throwable => }
    spark.stop()
  }
}
