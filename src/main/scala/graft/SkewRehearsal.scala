package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew rehearsal: run the relational headliners (q03, q19) and the
  * per-user sessionize on a hot-key corpus (ScaleGen skew mode) next to
  * the uniform corpus, and report (a) wall clock, (b) whether AQE
  * skew-join splitting actually fired, (c) the hot key's measured share.
  *
  *   runMain graft.SkewRehearsal uniform=target/sf1 skew5=target/sf1skew5
  *
  * Session shape: `autoBroadcastJoinThreshold = -1` forces every join to
  * sort-merge — the 100 TB fact↔fact shape this rehearsal is about. At
  * the gate scale AQE turns these joins into broadcasts, which are
  * trivially skew-immune (that immunity is already pinned by PlanSpec);
  * what needs rehearsing is the SMJ path that remains when NEITHER side
  * fits a broadcast. The AQE skew thresholds are scaled down in the same
  * proportion as the data — an sf1 local shuffle partition is single-digit
  * MB where a 100 TB cluster shuffle partition is GBs, so the default
  * 256 MB absolute floor would mask the mechanism being rehearsed; the
  * RATIO trigger (split when a partition exceeds 5× the median) is kept
  * at its default. */
object SkewRehearsal {

  def main(args: Array[String]): Unit = {
    val dirs: Seq[(String, String)] = (if (args.nonEmpty) args.toSeq
      else Seq("uniform=target/sf1", "skew5=target/sf1skew5"))
      .map { a =>
        require(a.contains("="),
          s"usage: runMain graft.SkewRehearsal <label>=<dir> [<label>=<dir> ...], got '$a'")
        val Array(k, v) = a.split("=", 2); (k, v)
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      // 200 partitions, not 32: the skew RATIO is what AQE tests (hot >
      // 5x median), and a cluster shuffles into many more partitions than
      // one hot key's share — at 32 partitions a 5% hot key is only 2.6x
      // the median and the (default, kept) factor-5 trigger correctly
      // stays quiet; at 200 it is ~11x, the true cluster-scale ratio
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SKEW_PARTS", "200"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // scaled-down byte floors (ratio trigger stays the default 5x median)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q03_revenue_by_nation" -> (graft.operators.Relational.q03RevenueByNation _),
      "q19_regional_revenue"  -> (graft.operators.Relational.q19RegionalRevenue _),
      "stream_sessionize_batch" -> (graft.streaming.EventStream.sessionizeBatchEquivalent _),
      "stream_sessionize_skewres" -> (graft.streaming.EventStream.sessionizeSkewResistant _),
      // doc-side skew targets (ScaleGen skew mode plants a hot SOURCE —
      // one per-source percentile group holding half the corpus — and a
      // 10x hot PARAGRAPH via the grown identical-copy cluster):
      // exact mode sorts the hot source's scores in one percentile group,
      // approx mode is the map-side-combined KLL scale path; paragraphs'
      // keep-first is a min-struct aggregate + a paras↔canon equi-join on
      // the hot md5
      "dedup_paragraphs" -> (graft.operators.Dedup.paragraphDedup _),
      "text_quality_filter_exact" ->
        ((s, d) => graft.operators.TextOps.qualityQuantileFilter(s, d)),
      "text_quality_filter_approx" ->
        ((s, d) => graft.operators.TextOps.qualityQuantileFilterOf(
          graft.core.Tables.documents(s, d), exact = false)))

    dirs.foreach { case (label, dir) =>
      // measured hot-key share per skewed axis (top-1 key's row fraction)
      def topShare(tbl: String, key: String): Double = {
        val df = graft.core.Tables(spark, dir, tbl)
        val total = df.count().toDouble
        val top = df.groupBy(col(key)).count().agg(max($"count")).head().getLong(0)
        math.round(top / total * 1000) / 1000.0
      }
      // documents: hot-source share + hot-paragraph share (top text md5 —
      // the identical-copy cluster's key in the keep-first aggregate)
      def topTextShare(): Double = {
        val df = graft.core.Tables(spark, dir, "documents")
        val total = df.count().toDouble
        val top = df.groupBy(md5(col("text"))).count().agg(max($"count"))
          .head().getLong(0)
        math.round(top / total * 1000) / 1000.0
      }
      println(s"[skew] $label shares: lineitem.l_orderkey=${topShare("lineitem", "l_orderkey")} " +
        s"orders.o_custkey=${topShare("orders", "o_custkey")} " +
        s"events.user_id=${topShare("events", "user_id")} " +
        s"documents.source=${topShare("documents", "source")} " +
        s"documents.text=${topTextShare()}")

      queries.foreach { case (name, fn) =>
        // one untimed warmup absorbs JIT/codegen/file-listing, then timed
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val times = (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        // final adaptive plan inspection: materialize df's own
        // QueryExecution WITHOUT a driver collect (sessionize emits
        // corpus-proportional rows) — run the executed plan's RDD and
        // count only partition sizes, then read the finalized plan
        val df = fn(spark, dir)
        df.queryExecution.executedPlan.execute().count()
        val planStr = df.queryExecution.executedPlan.toString
        val skewJoins = "skew=true".r.findAllMatchIn(planStr).size
        if (sys.env.contains("SPARK_GRAFT_SKEW_EXPLAIN")) println(planStr)
        println(f"[skew] $label $name min=${times.min}%.2fs " +
          f"(runs ${times.map(t => f"$t%.2f").mkString("/")}) skew_split_joins=$skewJoins")
      }
    }
    spark.stop()
  }
}
