package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit, md5, sum, when}

/** Output-layout utilities for engine results at scale.
  *
  * [[writeSortedClustered]] is the scalable replacement for the
  * reference's single sorted output file (`src/MapReduceMaster.java:
  * 449-478`): range-repartition on the sort key then sort within
  * partitions, so part files cover disjoint, globally ordered key ranges.
  * Consequences at 100 TB: no single-task sink bottleneck, and parquet
  * min/max footer stats per file line up with the key, so downstream
  * point/range reads prune whole files (verified in WritersSpec by
  * checking the ranges really are disjoint).
  */
object Writers {

  def writeSortedClustered(df: DataFrame, sortCols: Seq[String],
                           path: String, numPartitions: Int = 0): Unit = {
    val keyCols = sortCols.map(col)
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, keyCols: _*)
      else df.repartitionByRange(keyCols: _*)
    ranged.sortWithinPartitions(keyCols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** JSONL (newline-delimited JSON) round-trip of a document frame:
    * write with Spark's JSON sink, read back under the ORIGINAL schema.
    * JSONL is the interchange format LLM data pipelines actually live on
    * (crawl dumps, instruction sets, eval suites ship as .jsonl) — this
    * is the engine's evidence that the corpus survives the format
    * losslessly: escaping (quotes, backslashes, control chars), unicode,
    * and numeric types all verified by the oracle comparing the
    * round-tripped rows against the parquet originals.
    *
    * Scale shape: both legs are map-only distributed IO — executors
    * write/read line-delimited shards with no shuffle; JSONL's
    * one-record-per-line framing is what makes the format splittable and
    * therefore 100 TB-safe (a multi-line pretty-JSON sink would not
    * be). */
  private[graft] def jsonlRoundtripOf(docs: DataFrame, path: String): DataFrame = {
    docs.write.mode(SaveMode.Overwrite).json(path)
    docs.sparkSession.read.schema(docs.schema).json(path)
  }

  /** Gate query: round-trip the documents table through JSONL and emit a
    * content digest per row — hash-matched against the parquet originals
    * by the DuckDB oracle, so any escaping or type loss in either the
    * write or the read leg fails the gate. */
  def jsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    clearScratch("jsonl_rt") // see csvRoundtrip
    val path = java.nio.file.Paths.get("target", "jsonl_rt",
      java.lang.Long.toHexString(System.nanoTime())).toString
    jsonlRoundtripOf(graft.core.Tables.documents(s, d), path)
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("lang"), col("source"), col("n_chars"))
  }

  /** DuckDB twin of [[jsonlRoundtrip]] — the originals; equality proves
    * the round trip lost nothing. */
  val jsonlRoundtripOracle: String =
    "SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars FROM documents"

  /** Best-effort recursive delete of a round-trip staging root under
    * `target/` — stale dirs from prior runs only; never user data. */
  private def clearScratch(name: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    try rm(java.nio.file.Paths.get("target", name).toFile)
    catch { case _: Throwable => }
  }

  /** NULL sentinel for the CSV legs: Spark's CSV reader cannot tell an
    * empty field from NULL by default (both read back NULL), so writes
    * emit NULL as this never-in-corpus control byte and reads map ONLY
    * it back to NULL — an empty string then round-trips as itself
    * (emptyValue "") instead of silently becoming NULL. */
  private val CsvNullSentinel = "\u0001"

  private[graft] def csvRoundtripOf(df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).option("header", "true")
      .option("nullValue", CsvNullSentinel).option("emptyValue", "\"\"")
      .csv(path)
    df.sparkSession.read.schema(df.schema).option("header", "true")
      .option("nullValue", CsvNullSentinel).option("emptyValue", "")
      .csv(path)
  }

  /** Gate query: round-trip the events table's hostile columns through
    * CSV and digest the result — `props` is embedded JSON full of the
    * delimiter, quotes, and braces, so this is the quoting/escaping
    * torture test for the CSV source (the [[jsonlRoundtrip]] contract
    * applied to the second interchange format every pipeline still
    * ingests). Money is re-emitted as exact integer cents so the double
    * column's text round-trip never meets a float comparison.
    *
    * Scale shape: the CSV write/read is partition-parallel both ways
    * (splittable uncompressed CSV); the digest projection is map-only. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    // self-cleaning scratch: drop prior runs' staging dirs at entry (the
    // returned frame is lazy, so THIS run's dir can only be removed by
    // the NEXT call — bounding the leak to one leftover instead of one
    // per run); jsonlRoundtrip gets the same hygiene
    clearScratch("csv_rt")
    val path = java.nio.file.Paths.get("target", "csv_rt",
      java.lang.Long.toHexString(System.nanoTime())).toString
    val src = graft.core.Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"), col("props"))
    csvRoundtripOf(src, path)
      .select(col("event_id"), col("event_type"),
        md5(col("props")).as("props_md5"),
        expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"))
  }

  /** DuckDB twin of [[csvRoundtrip]] — the parquet originals; equality
    * proves no row, quote, or digit was harmed in the CSV leg. */
  val csvRoundtripOracle: String =
    """SELECT event_id, event_type, md5(props) AS props_md5,
      |  CAST(round(value * 100) AS BIGINT) AS value_cents FROM events""".stripMargin

  // ------------------------------------------------------ Z-order layout
  /** Bits interleaved per dimension: each column is first normalized
    * into 2^[[ZBits]] equal-width buckets over its observed range, so
    * dimensions of wildly different cardinalities (a 150-value key next
    * to a 2,400-day range) interleave at matched resolution — skipping
    * this is the classic z-order failure mode (the narrow column's high
    * bits are all zero and the curve degenerates to a single-column
    * sort; measured exactly that on the first cut: full custkey spread
    * per window). Delta/Iceberg OPTIMIZE ZORDER normalizes the same way
    * via per-column range ids. */
  val ZBits = 8

  /** Morton/Z-value of two dimension keys: bit i of `a` lands at output
    * bit 2i, bit i of `b` at 2i+1 — the space-filling-curve interleave
    * that makes one sort order serve range predicates on BOTH columns.
    * Emitted per dialect from the same unrolled integer expression, so
    * Spark and DuckDB compute identical values. */
  private[graft] def zExpr(a: String, b: String, spark: Boolean): String =
    (0 until ZBits).flatMap { i =>
      if (spark) Seq(
        s"shiftleft(shiftright($a, $i) & 1, ${2 * i})",
        s"shiftleft(shiftright($b, $i) & 1, ${2 * i + 1})")
      else Seq(
        s"((($a >> $i) & 1) << ${2 * i})",
        s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Z-order layout index over orders: interleave the customer key and
    * the order date (epoch days) so ONE clustered write serves range
    * scans on either dimension — the lakehouse data-layout technique
    * (Delta/Iceberg OPTIMIZE ZORDER) for the 100 TB case where a table
    * has two hot predicates and only one physical sort order to spend.
    * Pair with [[writeSortedClustered]] on `z`: parquet min/max footers
    * then bound BOTH key ranges per file, so either predicate prunes
    * whole files.
    *
    * Plan shape: one scan feeding a 1-row min/max bounds aggregate that
    * rides back as a scalar-subquery broadcast (census 1 exchange / 1
    * broadcast, exempted BNLJ), then the z-value itself is a pure
    * integer projection; the DuckDB twin evaluates the same unrolled
    * interleave bit-for-bit. */
  def zorderIndex(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, expr}
    val orders = graft.core.Tables.orders(s, d)
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) AS day_no")
    val bounds = orders.selectExpr(
      "min(o_custkey) AS cmin", "max(o_custkey) AS cmax",
      "min(day_no) AS dmin", "max(day_no) AS dmax")
    val n = 1 << ZBits
    orders.crossJoin(broadcast(bounds))
      .withColumn("cb", expr(s"((o_custkey - cmin) * $n) div (cmax - cmin + 1)"))
      .withColumn("db", expr(s"((day_no - dmin) * $n) div (dmax - dmin + 1)"))
      .selectExpr("o_orderkey", "cb", "db",
        s"CAST(${zExpr("cb", "db", spark = true)} AS BIGINT) AS z")
  }

  /** DuckDB twin of [[zorderIndex]] — the same normalization and
    * interleave in DuckDB's native shift operators. */
  val zorderIndexOracle: String = {
    val n = 1 << ZBits
    s"""WITH o AS (SELECT o_orderkey, o_custkey,
       |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no
       |  FROM orders),
       |b AS (SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
       |             min(day_no) AS dmin, max(day_no) AS dmax FROM o),
       |nb AS (SELECT o_orderkey,
       |    CAST(((o_custkey - cmin) * $n) // (cmax - cmin + 1) AS BIGINT) AS cb,
       |    CAST(((day_no - dmin) * $n) // (dmax - dmin + 1) AS BIGINT) AS db
       |  FROM o CROSS JOIN b)
       |SELECT o_orderkey, cb, db,
       |  CAST(${zExpr("cb", "db", spark = false)} AS BIGINT) AS z
       |FROM nb""".stripMargin
  }

  /** In-JVM reference of the same interleave, for the locality spec. */
  // ------------------------------------------------ compaction planner
  /** Ingest-batch granularity for the gate's fragment manifest: each
    * (source, doc_id div [[FragBatchDocs]]) group stands in for one
    * parquet fragment an hourly per-source ingest wrote. */
  val FragBatchDocs = 100L
  /** Size floor: fragments below this are compaction candidates. */
  val FragFloorBytes = 1500L
  /** Rewrite-group target size; next-fit closes a group rather than
    * exceed it. Floor &lt; target, so every candidate fits in an empty
    * group and group fill ≤ target is an invariant, not a hope. */
  val FragTargetBytes = 4000L

  /** SMALL-FILE COMPACTION PLAN — the daily maintenance operator of any
    * 100 TB parquet warehouse: streaming ingest leaves thousands of
    * KB-scale fragments per partition, and scan throughput dies by open
    * cost (each file = a footer read + a seek; 10k tiny files can cost
    * more than the bytes themselves). The planner bin-packs fragments
    * below [[FragFloorBytes]] into rewrite groups of ≤
    * [[FragTargetBytes]] via the same metadata-only NEXT-FIT fold as
    * [[graft.operators.Sampling.packSequences]] (O(1) state per
    * partition-key scan), never merging across `source` (a rewrite
    * group must stay inside one partition directory). Healthy
    * fragments and SINGLETON groups (one small fragment alone — a
    * rewrite would buy nothing) are planned `keep`. Output: one row
    * per fragment — (source, batch, bytes, action, group_no).
    *
    * The gate derives the manifest from `documents` data so the DuckDB
    * twin sees identical input; a production deployment feeds
    * [[compactionPlanOf]] the real file listing (path → source/batch,
    * footer size → bytes) — the plan is metadata-only either way: the
    * DATA is never read, only the listing moves, so the planner costs
    * |fragments| rows regardless of warehouse bytes.
    *
    * Scale shape: one map-side-combined manifest aggregate, one
    * repartition(source) + in-partition sort of |fragments| METADATA
    * rows, the O(1)-state fold, and a bounded (source, group) count
    * join for the singleton demotion. */
  def compactionPlan(s: SparkSession, d: String): DataFrame =
    compactionPlanOf(graft.core.Tables.documents(s, d)
      .groupBy(col("source"),
        expr(s"doc_id div $FragBatchDocs").as("batch"))
      .agg(sum(col("n_chars")).as("bytes")))

  /** [[compactionPlan]] over an arbitrary (source, batch, bytes)
    * fragment manifest. */
  private[graft] def compactionPlanOf(frags: DataFrame): DataFrame = {
    val s = frags.sparkSession
    import s.implicits._
    val healthy = frags.filter(col("bytes") >= FragFloorBytes)
      .select(col("source"), col("batch"), col("bytes"),
        lit("keep").as("action"), lit(0L).as("group_no"))
    val packed = frags.filter(col("bytes") < FragFloorBytes)
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("batch"))
      .select(col("source"), col("batch"), col("bytes"))
      .as[(String, Long, Long)]
      .mapPartitions { rows =>
        // O(1) state: the open group of the current source
        var cur: String = null
        var grp = 0L; var acc = 0L
        rows.map { case (src, b, bytes) =>
          if (src != cur) { cur = src; grp = 1L; acc = bytes }
          else if (acc + bytes <= FragTargetBytes) acc += bytes
          else { grp += 1; acc = bytes }
          (src, b, bytes, grp)
        }
      }
      .toDF("source", "batch", "bytes", "grp")
    val sizes = packed.groupBy(col("source"), col("grp"))
      .agg(count(lit(1)).as("n_in_group"))
    val small = packed.join(sizes, Seq("source", "grp"))
      .select(col("source"), col("batch"), col("bytes"),
        when(col("n_in_group") === 1L, "keep").otherwise("rewrite").as("action"),
        when(col("n_in_group") === 1L, 0L).otherwise(col("grp")).as("group_no"))
    healthy.unionAll(small)
  }

  /** DuckDB twin of [[compactionPlan]]: the same manifest aggregate,
    * the next-fit fold as a recursive CTE advancing each source one
    * row_number per step (the [[graft.operators.Sampling]] `packCtes`
    * discipline), the same singleton demotion. */
  val compactionPlanOracle: String =
    s"""WITH RECURSIVE f AS (SELECT source,
       |    CAST(doc_id // $FragBatchDocs AS BIGINT) AS batch,
       |    CAST(sum(n_chars) AS BIGINT) AS bytes
       |  FROM documents GROUP BY 1, 2),
       |sm AS (SELECT source, batch, bytes,
       |    row_number() OVER (PARTITION BY source ORDER BY batch) AS rn
       |  FROM f WHERE bytes < $FragFloorBytes),
       |p AS (
       |  SELECT source, rn, batch, bytes, CAST(1 AS BIGINT) AS grp, bytes AS acc
       |  FROM sm WHERE rn = 1
       |  UNION ALL
       |  SELECT s.source, s.rn, s.batch, s.bytes,
       |    CASE WHEN p.acc + s.bytes <= $FragTargetBytes THEN p.grp ELSE p.grp + 1 END,
       |    CASE WHEN p.acc + s.bytes <= $FragTargetBytes THEN p.acc + s.bytes ELSE s.bytes END
       |  FROM p JOIN sm s ON s.source = p.source AND s.rn = p.rn + 1),
       |g AS (SELECT source, grp, count(*) AS n_in_group FROM p GROUP BY 1, 2)
       |SELECT source, batch, bytes, 'keep' AS action,
       |  CAST(0 AS BIGINT) AS group_no
       |FROM f WHERE bytes >= $FragFloorBytes
       |UNION ALL
       |SELECT p.source, p.batch, p.bytes,
       |  CASE WHEN g.n_in_group = 1 THEN 'keep' ELSE 'rewrite' END AS action,
       |  CAST(CASE WHEN g.n_in_group = 1 THEN 0 ELSE p.grp END AS BIGINT) AS group_no
       |FROM p JOIN g USING (source, grp)""".stripMargin

  private[graft] def zValue(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < ZBits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  // ------------------------------------------- layout skipping audit
  /** Simulated row groups per layout for the skipping report. */
  val SkipBuckets = 64
  /** Probe predicate window, in integer percent of each dimension's
    * span: [45 %, 50 %) — a 5 % slice, all boundaries computed with
    * integer `div` so both engines place every row identically. */
  val SkipProbeLoPct = 45L
  val SkipProbeHiPct = 50L

  /** Data-layout effectiveness audit — the question OPTIMIZE ZORDER's
    * before/after report answers: if orders were written in B =
    * [[SkipBuckets]] row groups under each candidate layout (natural
    * insert order ≈ orderkey, single-column custkey sort, z-order), what
    * fraction of groups/rows does each probe predicate actually scan,
    * given min/max footer pruning? One row per (layout, predicate):
    * buckets scanned, rows scanned, total, scan share in integer micros.
    * The expected story this quantifies: the custkey sort serves the
    * custkey probe (~5 % scan) and abandons the date probe (~100 %);
    * z-order pays a moderate factor on BOTH — the reason a table with
    * two hot predicates z-orders instead of sorting.
    *
    * Buckets are VALUE-equal-width over each layout key's observed range
    * (the [[zorderIndex]] cb/db normalization) — map-only with a 1-row
    * bounds broadcast, deliberately NOT rank-based equal-count buckets,
    * which would need a global sort/window. Probe windows are span
    * percentiles of the SAME bounds row, so the whole report is two
    * scans (bounds + stats) followed by arithmetic on a ≤ 3·B-row frame.
    * A bucket is scanned iff its [min,max] of the probe column overlaps
    * the probe window — exactly the parquet footer test. */
  def layoutSkippingReport(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val n = 1 << ZBits
    val b = SkipBuckets
    val o = graft.core.Tables.orders(s, d)
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) AS day_no")
    val bounds = o.selectExpr(
      "min(o_orderkey) AS okmin", "max(o_orderkey) AS okmax",
      "min(o_custkey) AS cmin", "max(o_custkey) AS cmax",
      "min(day_no) AS dmin", "max(day_no) AS dmax")
    val stats = o.crossJoin(broadcast(bounds))
      .withColumn("cb", expr(s"((o_custkey - cmin) * $n) div (cmax - cmin + 1)"))
      .withColumn("db", expr(s"((day_no - dmin) * $n) div (dmax - dmin + 1)"))
      .withColumn("zv", expr(s"CAST(${zExpr("cb", "db", spark = true)} AS BIGINT)"))
      .selectExpr("o_custkey", "day_no",
        s"""explode(array(
           |  struct('natural' AS layout,
           |    ((o_orderkey - okmin) * $b) div (okmax - okmin + 1) AS bucket),
           |  struct('custkey_sorted' AS layout,
           |    ((o_custkey - cmin) * $b) div (cmax - cmin + 1) AS bucket),
           |  struct('zorder' AS layout, (zv * $b) div ${n.toLong * n} AS bucket)
           |)) AS lb""".stripMargin)
      .selectExpr("lb.layout AS layout", "lb.bucket AS bucket",
        "o_custkey", "day_no")
      .groupBy(col("layout"), col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        expr("min(o_custkey)").as("mnc"), expr("max(o_custkey)").as("mxc"),
        expr("min(day_no)").as("mnd"), expr("max(day_no)").as("mxd"))
    stats.crossJoin(broadcast(bounds))
      .selectExpr("layout", "bucket", "cnt", "mnc", "mxc", "mnd", "mxd",
        s"""explode(array(
           |  struct('custkey_range' AS predicate,
           |    cmin + ((cmax - cmin + 1) * $SkipProbeLoPct) div 100 AS lo,
           |    cmin + ((cmax - cmin + 1) * $SkipProbeHiPct) div 100 AS hi),
           |  struct('date_range' AS predicate,
           |    dmin + ((dmax - dmin + 1) * $SkipProbeLoPct) div 100 AS lo,
           |    dmin + ((dmax - dmin + 1) * $SkipProbeHiPct) div 100 AS hi)
           |)) AS p""".stripMargin)
      .withColumn("scanned", expr(
        """CASE WHEN p.predicate = 'custkey_range'
          |  THEN mxc >= p.lo AND mnc < p.hi
          |  ELSE mxd >= p.lo AND mnd < p.hi END""".stripMargin))
      .groupBy(col("layout"), col("p.predicate").as("predicate"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("scanned"), 1L).otherwise(0L)).as("buckets_scanned"),
        sum(when(col("scanned"), col("cnt")).otherwise(0L)).as("rows_scanned"),
        sum(col("cnt")).as("rows_total"))
      .withColumn("scan_micros",
        expr("rows_scanned * 1000000L div rows_total"))
      .orderBy(col("predicate"), col("layout"))
  }

  /** DuckDB twin of [[layoutSkippingReport]] — same bounds, bucket, and
    * overlap algebra; the z interleave via [[zExpr]]'s DuckDB emission. */
  val layoutSkippingReportOracle: String = {
    val n = 1 << ZBits
    val b = SkipBuckets
    s"""WITH o AS (SELECT o_orderkey, o_custkey,
       |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no
       |  FROM orders),
       |bd AS (SELECT min(o_orderkey) AS okmin, max(o_orderkey) AS okmax,
       |    min(o_custkey) AS cmin, max(o_custkey) AS cmax,
       |    min(day_no) AS dmin, max(day_no) AS dmax FROM o),
       |e AS (SELECT o.*, bd.*,
       |    ((o_custkey - cmin) * $n) // (cmax - cmin + 1) AS cb,
       |    ((day_no - dmin) * $n) // (dmax - dmin + 1) AS db
       |  FROM o CROSS JOIN bd),
       |z AS (SELECT e.*, CAST(${zExpr("cb", "db", spark = false)} AS BIGINT) AS zv
       |  FROM e),
       |m AS (
       |  SELECT 'natural' AS layout,
       |    ((o_orderkey - okmin) * $b) // (okmax - okmin + 1) AS bucket,
       |    o_custkey, day_no FROM z
       |  UNION ALL
       |  SELECT 'custkey_sorted',
       |    ((o_custkey - cmin) * $b) // (cmax - cmin + 1), o_custkey, day_no FROM z
       |  UNION ALL
       |  SELECT 'zorder', (zv * $b) // ${n.toLong * n}, o_custkey, day_no FROM z),
       |st AS (SELECT layout, bucket, CAST(count(*) AS BIGINT) AS cnt,
       |    min(o_custkey) AS mnc, max(o_custkey) AS mxc,
       |    min(day_no) AS mnd, max(day_no) AS mxd
       |  FROM m GROUP BY 1, 2),
       |pr AS (
       |  SELECT 'custkey_range' AS predicate,
       |    cmin + ((cmax - cmin + 1) * $SkipProbeLoPct) // 100 AS lo,
       |    cmin + ((cmax - cmin + 1) * $SkipProbeHiPct) // 100 AS hi FROM bd
       |  UNION ALL
       |  SELECT 'date_range',
       |    dmin + ((dmax - dmin + 1) * $SkipProbeLoPct) // 100,
       |    dmin + ((dmax - dmin + 1) * $SkipProbeHiPct) // 100 FROM bd),
       |sel AS (SELECT st.layout, pr.predicate, st.cnt,
       |    CASE WHEN pr.predicate = 'custkey_range'
       |      THEN st.mxc >= pr.lo AND st.mnc < pr.hi
       |      ELSE st.mxd >= pr.lo AND st.mnd < pr.hi END AS scanned
       |  FROM st CROSS JOIN pr)
       |SELECT layout, predicate, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(sum(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT) AS buckets_scanned,
       |  CAST(sum(CASE WHEN scanned THEN cnt ELSE 0 END) AS BIGINT) AS rows_scanned,
       |  CAST(sum(cnt) AS BIGINT) AS rows_total,
       |  CAST(sum(CASE WHEN scanned THEN cnt ELSE 0 END) AS BIGINT) * 1000000
       |    // CAST(sum(cnt) AS BIGINT) AS scan_micros
       |FROM sel GROUP BY 1, 2
       |ORDER BY predicate, layout""".stripMargin
  }
}
