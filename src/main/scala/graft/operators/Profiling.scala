package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Data-profiling and merge operators — the catalog/ETL surface of the
  * engine (the reference's closest analogs: `ls`/`store` metadata verbs
  * and `put`'s last-writer-wins update, SURVEY.md §2.2).
  */
object Profiling {

  /** Column profile of lineitem: one row per column with non-null count,
    * distinct count, and min/max (stringified for a uniform schema) — the
    * SUMMARIZE/DESCRIBE analog.
    *
    * Shape: exactly two scans, regardless of column count.
    *   1. counts + typed min/max for every column in ONE aggregation (no
    *      distincts → no Expand), reshaped long with `stack`.
    *   2. all exact distinct counts in ONE aggregation: melt to
    *      (column_name, value-as-string) and countDistinct per column —
    *      a single distinct aggregate plans as a plain two-phase
    *      hash aggregation. The trap this dodges: N countDistinct columns
    *      in one agg become an Expand duplicating every row N+1 times
    *      (measured 39 s vs 2 s at sf0.1); the earlier
    *      one-job-per-column form dodged Expand but paid 11 scans and
    *      ~3.4 s of job scheduling.
    * Stringified distinct counts are exact here: long/double/date/string
    * all stringify injectively. min/max compare TYPED (then cast) — a
    * lexicographic "99" > "100" can never happen. */
  def profileLineitem(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val cols = li.columns.toSeq
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}_cnt"),
      min(col(c)).cast("string").as(s"${c}_min"),
      max(col(c)).cast("string").as(s"${c}_max")) }
    val stats = li.agg(aggs.head, aggs.tail: _*).selectExpr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', ${c}_cnt, ${c}_min, ${c}_max").mkString(", ") +
        ") as (column_name, n_nonnull, min_value, max_value)")
    val melted = li.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("v"))): _*)).as("kv"))
      .select($"kv.column_name", $"kv.v")
    val distincts = melted.groupBy($"column_name")
      .agg(countDistinct($"v").as("n_distinct"))
    stats.join(distincts, "column_name")
      .select($"column_name", $"n_nonnull", $"n_distinct",
        $"min_value", $"max_value")
  }

  /** [[profileLineitem]]'s 100 TB default: identical schema, NDV via
    * `approx_count_distinct` (HLL++, rsd 2% — at 1% the 4× larger register
    * arrays made the aggregate ~3× slower for one digit of precision).
    * approximate-distinct is an ordinary partial-aggregable function, so
    * ALL columns profile in ONE scan + ONE single-row aggregate — no melt,
    * no ×N-columns shuffle, no Expand. The exact form above is the oracle
    * mode (and what the correctness gate pins); at corpus scale exact
    * per-column NDV is a full-data shuffle per profile run and approx is
    * the right default. ProfilingSpec bounds the approx error against the
    * exact profile. */
  def profileLineitemApprox(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val cols = li.columns.toSeq
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}_cnt"),
      approx_count_distinct(col(c), 0.02).as(s"${c}_nd"),
      min(col(c)).cast("string").as(s"${c}_min"),
      max(col(c)).cast("string").as(s"${c}_max")) }
    li.agg(aggs.head, aggs.tail: _*).selectExpr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', ${c}_cnt, ${c}_nd, ${c}_min, ${c}_max").mkString(", ") +
        ") as (column_name, n_nonnull, n_distinct, min_value, max_value)")
  }

  val profileLineitemOracle: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, count($c) AS n_nonnull,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_value,
         | CAST(max($c) AS VARCHAR) AS max_value FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  /** Upsert/merge: a derived source batch (updated totalprice for even
    * order keys, plus new keys beyond the current max) merged into orders
    * with source-wins semantics — the engine-level form of the reference's
    * last-writer-wins `put` (SDFSServer picks the max-timestamp replica).
    * Full-outer join + coalesce: one shuffle, no driver involvement. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val target = Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("o_totalprice"))
    // +1000.0 not *1.1: multiplying makes exact .005 boundaries where
    // Spark's BigDecimal rounding and DuckDB's fp rounding disagree;
    // addition keeps the value away from rounding entirely
    val source = target.filter($"o_orderkey" % 2 === 0)
      .select($"o_orderkey", $"o_custkey",
        ($"o_totalprice" + 1000.0).as("o_totalprice"))
      .union(target.filter($"o_orderkey" < 100)
        .select(($"o_orderkey" + 10000000L).as("o_orderkey"), $"o_custkey",
          $"o_totalprice"))
    target.as("t").join(source.as("s"), Seq("o_orderkey"), "full_outer")
      .select($"o_orderkey",
        coalesce($"s.o_custkey", $"t.o_custkey").as("o_custkey"),
        coalesce($"s.o_totalprice", $"t.o_totalprice").as("o_totalprice"))
  }

  val mergeUpsertOracle: String =
    """WITH target AS (
      |  SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      |  FROM orders),
      |source AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
      |  FROM target WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
      |  FROM target WHERE o_orderkey < 100)
      |SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
      |       coalesce(s.o_custkey, t.o_custkey) AS o_custkey,
      |       coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice
      |FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey""".stripMargin

  // --------------------------------------------------- RFM segmentation
  /** RFM quartile fractions — quarter points keep Spark's interpolated
    * `percentile` and DuckDB's `quantile_cont` exact in double (the
    * [[Corpus.ccnetBuckets]] analysis). */
  val RfmQuartiles = Seq(0.25, 0.5, 0.75)

  /** RFM customer segmentation — the classic warehouse scoring table:
    * per customer, Recency (days from their last order to the corpus'
    * last order date), Frequency (order count), Monetary (lifetime
    * total in exact integer cents), each scored into quartiles 1–4
    * (4 = best: most recent / most frequent / highest spend) against
    * the corpus-wide quartile cuts.
    *
    * Scale shape: ONE orders scan feeding a customer-keyed aggregate
    * (map-side combined); the global last-order date and the nine
    * quartile cuts are 1-row aggregates OF the bounded per-customer
    * frame riding scalar-subquery broadcasts — no global window, no
    * ntile: scores are integer comparisons against broadcast cuts (the
    * [[Corpus.ccnetBuckets]] scoring idiom), so the whole thing is one
    * shuffle plus bounded arithmetic at any corpus size. */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = Tables.orders(s, d)
      .select($"o_custkey".as("custkey"), $"o_orderdate",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy($"custkey")
      .agg(max($"o_orderdate").as("last_dt"),
        count(lit(1)).as("f_orders"), sum($"cents").as("m_cents"))
    val gmax = per.agg(max($"last_dt").as("gmax"))
    val rfm = per.crossJoin(broadcast(gmax))
      .withColumn("r_days", expr("CAST(datediff(gmax, last_dt) AS BIGINT)"))
      .select($"custkey", $"r_days", $"f_orders", $"m_cents")
    val cutCols = Seq("r_days" -> "rq", "f_orders" -> "fq", "m_cents" -> "mq")
      .flatMap { case (m, pre) =>
        RfmQuartiles.zipWithIndex.map { case (p, i) =>
          expr(s"percentile($m, $p)").as(s"$pre$i") } }
    val cuts = rfm.agg(cutCols.head, cutCols.tail: _*)
    rfm.crossJoin(broadcast(cuts))
      .select($"custkey", $"r_days", $"f_orders", $"m_cents",
        // recency inverts: fewer days since last order = better
        expr("4 - (CAST(r_days > rq0 AS INT) + CAST(r_days > rq1 AS INT) + CAST(r_days > rq2 AS INT))").as("r_score"),
        expr("1 + CAST(f_orders > fq0 AS INT) + CAST(f_orders > fq1 AS INT) + CAST(f_orders > fq2 AS INT)").as("f_score"),
        expr("1 + CAST(m_cents > mq0 AS INT) + CAST(m_cents > mq1 AS INT) + CAST(m_cents > mq2 AS INT)").as("m_score"))
      .orderBy($"custkey")
  }

  /** DuckDB twin of [[rfmSegments]] — `quantile_cont` mirrors Spark's
    * interpolated `percentile` exactly at quarter fractions. */
  val rfmSegmentsOracle: String =
    """WITH per AS (SELECT o_custkey AS custkey, max(o_orderdate) AS last_dt,
      |    CAST(count(*) AS BIGINT) AS f_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m_cents
      |  FROM orders GROUP BY o_custkey),
      |g AS (SELECT max(last_dt) AS gmax FROM per),
      |rfm AS (SELECT custkey,
      |    CAST(date_diff('day', last_dt, g.gmax) AS BIGINT) AS r_days,
      |    f_orders, m_cents
      |  FROM per CROSS JOIN g),
      |cuts AS (SELECT
      |    quantile_cont(r_days, 0.25) AS rq0, quantile_cont(r_days, 0.5) AS rq1,
      |    quantile_cont(r_days, 0.75) AS rq2,
      |    quantile_cont(f_orders, 0.25) AS fq0, quantile_cont(f_orders, 0.5) AS fq1,
      |    quantile_cont(f_orders, 0.75) AS fq2,
      |    quantile_cont(m_cents, 0.25) AS mq0, quantile_cont(m_cents, 0.5) AS mq1,
      |    quantile_cont(m_cents, 0.75) AS mq2
      |  FROM rfm)
      |SELECT custkey, r_days, f_orders, m_cents,
      |  4 - (CAST(r_days > rq0 AS INT) + CAST(r_days > rq1 AS INT)
      |       + CAST(r_days > rq2 AS INT)) AS r_score,
      |  1 + CAST(f_orders > fq0 AS INT) + CAST(f_orders > fq1 AS INT)
      |    + CAST(f_orders > fq2 AS INT) AS f_score,
      |  1 + CAST(m_cents > mq0 AS INT) + CAST(m_cents > mq1 AS INT)
      |    + CAST(m_cents > mq2 AS INT) AS m_score
      |FROM rfm CROSS JOIN cuts
      |ORDER BY custkey""".stripMargin

  // --------------------------------------- incremental view maintenance
  /** Incremental aggregate maintenance — the only affordable way to keep
    * a 100 TB warehouse's rollups current: given the BASE snapshot's
    * per-customer aggregate and a signed DELTA (inserts +1, deletes −1,
    * updates as a −old/+new pair — the classic IVM delta encoding), merge
    * them and emit the maintained aggregate. The engine path NEVER
    * touches the new snapshot's full fact table; the DuckDB twin
    * recomputes from scratch over the new snapshot, so a hash match is a
    * proof the delta algebra is exact, not a re-run of the same plan.
    *
    * Snapshots are synthesized deterministically from orders (the
    * [[snapshotDiff]] convention): BASE = o_orderkey % 10 &lt; 9;
    * deletes ≡ 3 (mod 41); surviving keys ≡ 0 (mod 7) get a +1000.00
    * price update; inserts are the % 10 = 9 keys. Money rides integer
    * CENTS end-to-end (`round(price·100)` at the scan), so deletion
    * subtraction is exact — a double-sum IVM path would accumulate the
    * subtraction error the batch recompute never sees.
    *
    * Scale shape: base agg is one map-side-combined shuffle of the BASE
    * (in production: already materialized); the delta agg shuffles only
    * the churn; the merge is a full-outer equi-join of two
    * customer-keyed aggregates. Groups whose rows all vanish leave with
    * n_orders = 0 (filtered, matching the recompute). */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    incrementalAggOf(Tables.orders(s, d).select($"o_orderkey".as("k"),
      $"o_custkey".as("custkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")))
  }

  private[graft] def incrementalAggOf(o: DataFrame): DataFrame = {
    val s = o.sparkSession
    import s.implicits._
    val base = o.filter($"k" % 10 < 9)
    val baseAgg = base.groupBy($"custkey")
      .agg(count(lit(1)).as("n0"), sum($"cents").as("s0"))
    val del = base.filter($"k" % 41 === 3)
      .select($"custkey", lit(-1L).as("dn"), (-$"cents").as("ds"))
    val updatedKeys = base.filter($"k" % 41 =!= 3 && $"k" % 7 === 0)
    val updOld = updatedKeys
      .select($"custkey", lit(-1L).as("dn"), (-$"cents").as("ds"))
    val updNew = updatedKeys
      .select($"custkey", lit(1L).as("dn"), ($"cents" + 100000L).as("ds"))
    val ins = o.filter($"k" % 10 === 9)
      .select($"custkey", lit(1L).as("dn"), $"cents".as("ds"))
    val deltaAgg = del.union(updOld).union(updNew).union(ins)
      .groupBy($"custkey")
      .agg(sum($"dn").as("dn"), sum($"ds").as("ds"))
    baseAgg.join(deltaAgg, Seq("custkey"), "full_outer")
      .select($"custkey",
        (coalesce($"n0", lit(0L)) + coalesce($"dn", lit(0L))).as("n_orders"),
        (coalesce($"s0", lit(0L)) + coalesce($"ds", lit(0L))).as("total_cents"))
      .filter($"n_orders" > 0)
      .orderBy($"custkey")
  }

  /** DuckDB twin of [[incrementalAgg]] — the full recompute over the NEW
    * snapshot the incremental path must agree with. */
  val incrementalAggOracle: String =
    """WITH o AS (SELECT o_orderkey AS k, o_custkey AS custkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |new_snap AS (
      |  SELECT custkey,
      |    CASE WHEN k % 7 = 0 THEN cents + 100000 ELSE cents END AS cents
      |  FROM o WHERE k % 10 < 9 AND k % 41 <> 3
      |  UNION ALL
      |  SELECT custkey, cents FROM o WHERE k % 10 = 9)
      |SELECT custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM new_snap GROUP BY custkey
      |ORDER BY custkey""".stripMargin

  // -------------------------------------------------------- snapshot diff
  /** Diff two corpus snapshots by content digest — the "what changed in
    * this drop" report run before re-training on a refreshed corpus:
    * (doc_id, status ∈ added|removed|changed) for every doc that differs;
    * unchanged docs (the overwhelming bulk at 100 TB) are filtered OUT
    * before the result materializes, so output is proportional to the
    * churn, not the corpus.
    *
    * Snapshots are synthesized deterministically from the one documents
    * table (the [[mergeUpsert]] convention): OLD = ids with id%10 < 9;
    * NEW = OLD minus ids ≡ 3 (mod 41) [removed], plus ids with
    * id%10 = 9 [added], with text of ids ≡ 0 (mod 7) suffixed [changed].
    *
    * Scale shape: one full-outer join on doc_id comparing md5(text) —
    * co-partitioned on the id, AQE-splittable; digests are computed in
    * the scan projection so the join carries (id, 32-byte digest), never
    * text. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val old = docs.filter($"doc_id" % 10 < 9)
    val neu = old.filter($"doc_id" % 41 =!= 3)
      .select($"doc_id",
        when($"doc_id" % 7 === 0, concat($"text", lit(" [rev2]")))
          .otherwise($"text").as("text"))
      .unionAll(docs.filter($"doc_id" % 10 === 9))
    old.select($"doc_id", md5($"text").as("h_old"))
      .join(neu.select($"doc_id", md5($"text").as("h_new")),
        Seq("doc_id"), "full_outer")
      .select($"doc_id",
        when($"h_old".isNull, "added")
          .when($"h_new".isNull, "removed")
          .when($"h_old" =!= $"h_new", "changed").as("status"))
      .filter($"status".isNotNull)
  }

  /** DuckDB twin: same synthesized snapshots, same digest compare. */
  val snapshotDiffOracle: String =
    """WITH docs AS (SELECT doc_id, text FROM documents),
      |old AS (SELECT doc_id, text FROM docs WHERE doc_id % 10 < 9),
      |neu AS (
      |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
      |                 ELSE text END AS text
      |  FROM old WHERE doc_id % 41 <> 3
      |  UNION ALL SELECT doc_id, text FROM docs WHERE doc_id % 10 = 9),
      |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |        md5(o.text) AS h_old, md5(n.text) AS h_new
      |      FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id)
      |SELECT doc_id,
      |  CASE WHEN h_old IS NULL THEN 'added'
      |       WHEN h_new IS NULL THEN 'removed'
      |       WHEN h_old <> h_new THEN 'changed' END AS status
      |FROM j
      |WHERE h_old IS NULL OR h_new IS NULL OR h_old <> h_new""".stripMargin

  // ------------------------------------------------------- integrity audit
  /** Referential/shape integrity audit — the pre-flight a pipeline runs
    * before training consumes a corpus drop: one (check_name, n) row per
    * invariant, n = 0 meaning clean. Checks: duplicate doc ids, empty
    * text, docs↔embeddings referential closure both ways, null/empty and
    * ragged embedding vectors (vs the corpus MODE dimension), and the
    * relational FK closures orders→customer and lineitem→orders.
    *
    * Scale shape: every check is ONE distributed aggregate — anti joins
    * shuffle on their key (AQE-splittable), the dup check is a groupBy
    * count, and the mode dimension is a bounded |distinct dims|-row
    * aggregate joined back as a broadcast scalar subquery. The result is
    * a union of single-row aggregates; nothing is collected. */
  def auditIntegrity(s: SparkSession, d: String): DataFrame =
    auditIntegrityOf(Tables.documents(s, d), Tables.embeddings(s, d),
      Tables.orders(s, d), Tables.customer(s, d), Tables.lineitem(s, d))

  /** [[auditIntegrity]] over arbitrary frames (specs plant violations). */
  private[graft] def auditIntegrityOf(docs: DataFrame, emb: DataFrame,
      orders: DataFrame, cust: DataFrame, li: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    def one(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("check_name"), $"n")
    val modalDim = emb.filter($"embedding".isNotNull)
      .groupBy(size($"embedding").as("dim")).agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"dim".asc).limit(1).select($"dim")
    Seq(
      one("docs_total", docs),
      one("docs_empty_text", docs.filter($"text".isNull || length($"text") === 0)),
      one("docs_dup_id",
        docs.groupBy($"doc_id").agg(count(lit(1)).as("c")).filter($"c" > 1)),
      one("docs_missing_embedding",
        docs.join(emb, docs("doc_id") === emb("vec_id"), "left_anti")),
      one("embeddings_orphan",
        emb.join(docs, emb("vec_id") === docs("doc_id"), "left_anti")),
      one("embeddings_null_vec",
        emb.filter($"embedding".isNull || size($"embedding") === 0)),
      one("embeddings_ragged_dim",
        emb.filter($"embedding".isNotNull).crossJoin(broadcast(modalDim))
          .filter(size($"embedding") =!= $"dim")),
      one("orders_orphan_custkey",
        orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left_anti")),
      one("lineitem_orphan_orderkey",
        li.join(orders, li("l_orderkey") === orders("o_orderkey"), "left_anti")),
    ).reduce(_ unionAll _)
  }

  /** DuckDB twin: NOT EXISTS ≡ Spark left_anti (both keep NULL-key left
    * rows), mode dimension via the same (count DESC, dim ASC) total-order
    * cut. `check` is a reserved word — hence `check_name`. */
  val auditIntegrityOracle: String =
    """SELECT 'docs_total' AS check_name, CAST(count(*) AS BIGINT) AS n FROM documents
      |UNION ALL SELECT 'docs_empty_text', count(*) FROM documents
      |  WHERE text IS NULL OR length(text) = 0
      |UNION ALL SELECT 'docs_dup_id', count(*) FROM
      |  (SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) > 1)
      |UNION ALL SELECT 'docs_missing_embedding', count(*) FROM documents d
      |  WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
      |UNION ALL SELECT 'embeddings_orphan', count(*) FROM embeddings e
      |  WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)
      |UNION ALL SELECT 'embeddings_null_vec', count(*) FROM embeddings
      |  WHERE embedding IS NULL OR len(embedding) = 0
      |UNION ALL SELECT 'embeddings_ragged_dim', count(*) FROM embeddings
      |  WHERE embedding IS NOT NULL AND len(embedding) <>
      |    (SELECT dim FROM (SELECT len(embedding) AS dim, count(*) AS c
      |       FROM embeddings WHERE embedding IS NOT NULL
      |       GROUP BY 1 ORDER BY c DESC, dim ASC LIMIT 1))
      |UNION ALL SELECT 'orders_orphan_custkey', count(*) FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL SELECT 'lineitem_orphan_orderkey', count(*) FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin

  // ------------------------------------------------------------ SCD2 build
  /** Slowly-changing-dimension (type 2) history build — the
    * change-data-capture companion to [[mergeUpsert]]'s last-writer-wins
    * (type 1) semantics: treating each customer's order stream as the
    * change feed of their `o_orderpriority` attribute, emit one validity
    * interval per observed VALUE CHANGE — `[valid_from, valid_to)` with
    * `valid_to` open (NULL) on the current version. Kimball's SCD2 is the
    * standard way a warehouse keeps attribute history queryable
    * point-in-time; the engine form is two window passes.
    *
    * Deterministic: the change feed is ordered by (o_orderdate,
    * o_orderkey) within each customer, so same-day reorders have a
    * defined sequence. Scale shape: ONE hash exchange on custkey feeds
    * both window passes (change detection via lag, then versioning via
    * row_number/lead over the surviving change rows — same partitioning,
    * no second shuffle); per-customer state is O(orders per customer).
    * No global window, no collect. */
  def scd2History(s: SparkSession, d: String): DataFrame =
    scd2HistoryOf(Tables.orders(s, d))

  /** [[scd2History]] over an arbitrary orders-shaped change feed. */
  private[graft] def scd2HistoryOf(orders: DataFrame): DataFrame = {
    val s = orders.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val changes = orders
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .withColumn("prev", lag($"o_orderpriority", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"o_orderpriority")
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead($"o_orderdate", 1).over(w))
      .select($"o_custkey".as("custkey"), $"version",
        $"o_orderpriority".as("priority"),
        $"o_orderdate".as("valid_from"), $"valid_to",
        $"valid_to".isNull.as("is_current"))
  }

  /** Skew-resistant twin of [[scd2History]] — the [[graft.operators.Events]]
    * transitions / sessionize pair discipline: same output, same oracle,
    * no per-customer straggler. A 100 TB change feed with one hot entity
    * (ScaleGen's skew mode plants half of all orders on ONE customer)
    * serializes [[scd2History]]'s window sort into a single task; here
    * every HEAVY sort is partitioned by (customer, month-bucket), and the
    * customer-level passes run over BOUNDED per-bucket aggregates:
    *
    *   - change detection: in-bucket lag, with each bucket's first row
    *     stitched against the previous bucket's last priority (a
    *     |cust·buckets|-row aggregate);
    *   - version numbering: in-bucket row_number + per-bucket change
    *     counts prefix-summed per customer (the train_curriculum_order
    *     "total order without a global window" recipe);
    *   - interval chaining: in-bucket lead, bucket-last rows stitched to
    *     the next changing bucket's first change date.
    *
    * GraphSpec-style equality: ProfilingSpec pins this form equal to
    * [[scd2History]] row-for-row, and the gate runs it against the SAME
    * DuckDB oracle. */
  def scd2HistorySkewResistant(s: SparkSession, d: String): DataFrame =
    scd2SkewResistantOf(Tables.orders(s, d))

  /** [[scd2HistorySkewResistant]] over an arbitrary orders-shaped feed. */
  private[graft] def scd2SkewResistantOf(orders: DataFrame): DataFrame = {
    val s = orders.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val o = orders
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .withColumn("bucket",
        expr("year(o_orderdate) * 12 + month(o_orderdate)"))
    val wIn = Window.partitionBy($"o_custkey", $"bucket")
      .orderBy($"o_orderdate", $"o_orderkey")
    val lagged = o.withColumn("prev_in", lag($"o_orderpriority", 1).over(wIn))
    // bounded boundary table: each (cust, bucket)'s LAST priority, lagged
    // one bucket forward so a bucket's first row sees its true predecessor
    val wB = Window.partitionBy($"o_custkey").orderBy($"bucket")
    val prevLast = o.groupBy($"o_custkey", $"bucket")
      .agg(max_by($"o_orderpriority", struct($"o_orderdate", $"o_orderkey"))
        .as("last_pri"))
      .withColumn("prev_last", lag($"last_pri", 1).over(wB))
      .select($"o_custkey", $"bucket", $"prev_last")
    val changes = lagged.join(prevLast, Seq("o_custkey", "bucket"))
      .withColumn("prev", coalesce($"prev_in", $"prev_last"))
      .filter($"prev".isNull || $"prev" =!= $"o_orderpriority")
      .select($"o_custkey", $"bucket", $"o_orderkey", $"o_orderdate",
        $"o_orderpriority")
    val numbered = changes
      .withColumn("rn_in", row_number().over(wIn))
      .withColumn("next_in", lead($"o_orderdate", 1).over(wIn))
    // per-bucket change stats (bounded): count → per-customer prefix-sum
    // offsets; first change date → the stitch target for bucket-last rows
    val off = numbered.groupBy($"o_custkey", $"bucket")
      .agg(count(lit(1)).as("c"),
        min(struct($"o_orderdate", $"o_orderkey")).as("fst"))
      .withColumn("offset", coalesce(
        sum($"c").over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("next_first", lead($"fst.o_orderdate", 1).over(wB))
      .select($"o_custkey", $"bucket", $"offset", $"next_first")
    numbered.join(off, Seq("o_custkey", "bucket"))
      .select($"o_custkey".as("custkey"),
        ($"offset" + $"rn_in").cast("int").as("version"),
        $"o_orderpriority".as("priority"),
        $"o_orderdate".as("valid_from"),
        coalesce($"next_in", $"next_first").as("valid_to"),
        coalesce($"next_in", $"next_first").isNull.as("is_current"))
  }

  /** DuckDB twin of [[scd2History]] — identical two-pass window shape. */
  val scd2HistoryOracle: String =
    """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |ch AS (SELECT * FROM o WHERE prev IS NULL OR prev <> o_orderpriority)
      |SELECT o_custkey AS custkey,
      |  row_number() OVER w AS version,
      |  o_orderpriority AS priority,
      |  o_orderdate AS valid_from,
      |  lead(o_orderdate) OVER w AS valid_to,
      |  lead(o_orderdate) OVER w IS NULL AS is_current
      |FROM ch
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // --------------------------------------------------- hot-key diagnostic
  /** Misra–Gries capacity per audited column. The φ-heavy-hitter
    * guarantee needs capacity + 1 &gt; 1/φ: a partition-local sketch
    * undercounts by at most N_p/(capacity+1), so any key with local
    * frequency above that survives the partition, and a key with GLOBAL
    * frequency &gt; N/(capacity+1) must exceed the local bound in at
    * least one partition (averaging argument: the per-partition bounds
    * sum to N/(capacity+1)). 127 &gt; 125 − 1, so φ = 1/125 is safe. */
  val MgCapacity = 127
  /** Hotness threshold denominator: a key is hot iff cnt · 125 > N,
    * i.e. it carries more than 0.8 % of the column's mass. */
  val HotPhiInv = 125

  /** Partition-local Misra–Gries pass over the melted (key_col, key)
    * stream, one sketch per audited column. Emits each column's
    * candidate keys as (col, key, 0) rows plus one (col, null, n_p)
    * summary row carrying the partition's row count — no collect, no
    * driver traffic beyond the bounded candidate union. */
  private[graft] def mgSketch(it: Iterator[(String, String)], cap: Int)
      : Iterator[(String, String, Long)] = {
    val state = collection.mutable.Map[String, collection.mutable.Map[String, Long]]()
    val totals = collection.mutable.Map[String, Long]()
    while (it.hasNext) {
      val (col, key) = it.next()
      totals.update(col, totals.getOrElse(col, 0L) + 1L)
      val m = state.getOrElseUpdate(col, collection.mutable.Map.empty)
      m.get(key) match {
        case Some(c)               => m.update(key, c + 1)
        case None if m.size < cap  => m.update(key, 1L)
        case None =>
          // the decrement step: every counter drops by 1, zeros evicted
          val dead = m.collect { case (k, 1L) => k }.toList
          m.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(m.remove)
      }
    }
    state.iterator.flatMap { case (col, m) =>
      m.keysIterator.map(k => (col, k, 0L))
    } ++ totals.iterator.map { case (col, n) => (col, null: String, n) }
  }

  /** Hot-key diagnostic over events — the audit a pipeline owner runs on
    * a join/groupBy key BEFORE choosing a salting strategy: every key of
    * `event_type` and `user_id` carrying more than 1/[[HotPhiInv]] of its
    * column's row mass, with its exact count and integer-micros share.
    * Two-pass sketch-then-verify (the production bounded-memory shape,
    * Misra & Gries 1982 / Agarwal et al. 2012 mergeable summaries):
    * pass 1 runs a partition-local [[MgCapacity]]-counter sketch per
    * column whose candidate union is GUARANTEED to contain every
    * φ-heavy key (see [[MgCapacity]]), pass 2 exact-counts ONLY the
    * candidates (broadcast admission semi-join) and keeps keys over the
    * threshold — so the final output is exact and deterministic even
    * though the sketch's candidate set is partition-order-dependent.
    * The empty answer is meaningful: a uniform high-cardinality column
    * (user_id at large scale) genuinely has no φ-heavy keys.
    *
    * Scale shape: pass 1 is map-only with ≤ (partitions · capacity)
    * candidate rows shuffled; pass 2's aggregate is bounded by the
    * candidate set, NOT the column's cardinality — at 100 TB the full
    * per-key groupBy this replaces is itself a shuffle of the key space,
    * which is exactly what a skew audit must not assume is feasible.
    * N per column rides a |columns|-row broadcast.
    *
    * NULL keys are excluded BY CONTRACT on both engines (filtered from
    * the melted stream before the sketch, `IS NOT NULL` in the twin):
    * the sketch's summary row uses a null key as its marker, and pass
    * 2's equi-join could never count a null candidate anyway (null
    * matches nothing under SQL join equality). A pipeline owner who
    * needs the null share of a column audits it with a plain
    * count-where-null — nulls are one known key, not a discovery
    * problem, so they don't need a sketch. */
  def hotKeys(s: SparkSession, d: String): DataFrame =
    hotKeysOf(Tables.events(s, d).selectExpr(
        """explode(array(
          |  struct('event_type' AS key_col, event_type AS key),
          |  struct('user_id' AS key_col, CAST(user_id AS STRING) AS key))) AS kv"""
          .stripMargin)
      .selectExpr("kv.key_col AS key_col", "kv.key AS key"))

  private[graft] def hotKeysOf(meltedRaw: DataFrame): DataFrame = {
    val s = meltedRaw.sparkSession
    import s.implicits._
    val melted = meltedRaw.filter($"key".isNotNull)
    val sketch = melted.as[(String, String)]
      .mapPartitions(it => mgSketch(it, MgCapacity))
      .toDF("key_col", "key", "n_part")
    val cands = sketch.filter($"key".isNotNull)
      .select($"key_col", $"key").distinct()
    val totals = sketch.filter($"key".isNull)
      .groupBy($"key_col").agg(sum($"n_part").as("n"))
    melted
      .join(broadcast(cands), Seq("key_col", "key"))
      .groupBy($"key_col", $"key").agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), "key_col")
      .filter($"cnt" * HotPhiInv > $"n")
      .select($"key_col", $"key", $"cnt",
        expr("cnt * 1000000L div n").as("share_micros"))
      .orderBy($"key_col", $"cnt".desc, $"key")
  }

  /** DuckDB twin of [[hotKeys]] — the one-pass exact form (the oracle
    * can afford the full per-key groupBy the sketch exists to avoid). */
  val hotKeysOracle: String =
    s"""WITH m AS (
       |  SELECT 'event_type' AS key_col, event_type AS key FROM events
       |  UNION ALL
       |  SELECT 'user_id' AS key_col, CAST(user_id AS VARCHAR) AS key FROM events),
       |c AS (SELECT key_col, key, CAST(count(*) AS BIGINT) AS cnt
       |  FROM m WHERE key IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT key_col, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY key_col)
       |SELECT c.key_col, c.key, c.cnt, c.cnt * 1000000 // t.n AS share_micros
       |FROM c JOIN t USING (key_col)
       |WHERE c.cnt * $HotPhiInv > t.n
       |ORDER BY key_col, cnt DESC, key""".stripMargin

  // ---------------------------------------------- categorical entropy census
  /** Categorical columns profiled by [[entropy]]: (table, column). */
  val EntropyCols: Seq[(String, String)] = Seq(
    "events"    -> "event_type",
    "documents" -> "source",
    "documents" -> "lang",
    "orders"    -> "o_orderpriority",
    "orders"    -> "o_orderstatus",
    "customer"  -> "c_mktsegment")

  /** Shannon-entropy census of the warehouse's categorical columns — the
    * skew/balance diagnostic read before choosing partition keys, salts,
    * or stratification columns ([[hotKeys]] finds the single heavy
    * hitter; entropy scores the WHOLE distribution): H near log₂(V)
    * means a safe partition key, H near 0 means one value dominates.
    *
    * Float discipline: each term p·(−log₂ p) is computed from exact
    * integer counts with identical IEEE ops on both engines (one divide,
    * one log, one multiply — the [[Corpus.lmBits]] log-parity idiom) and
    * snapped to integer MICRO-BITS before summation, so the sum is exact
    * integer arithmetic with no association-order edge (the round-9
    * bitext-margin lesson applied from the start). NULLs are excluded
    * from the distribution BY CONTRACT on both engines (the round-9
    * hot-key null lesson).
    *
    * Scale shape: ONE scan per TABLE, not per column — the columns of a
    * table melt through `stack()` into (table_col, v) rows before the
    * count aggregate (the first cut scanned each table once per column:
    * 6 scans / 24 shuffles for 4 tables; the melt shares the scan and
    * halves the exchanges). Per table: one map-side-combined
    * (table_col, v) count, one table_col-partitioned window (bounded by
    * |V| per column, never a global sort), one final per-column sum.
    * Output is |[[EntropyCols]]| rows. A fully-NULL column degenerates
    * to (label, 0, 0, NULL, NULL) BY CONTRACT on both engines (the
    * labels left-join below; the oracle's CASE guard mirrors it). */
  def entropy(s: SparkSession, d: String): DataFrame =
    EntropyCols.map(_._1).distinct.map { t =>
      val cols = EntropyCols.collect { case (`t`, c) => c }
      val melted = Tables(s, d, t).selectExpr(
        s"stack(${cols.length}, " +
          cols.map(c => s"'$t.$c', $c").mkString(", ") +
          ") AS (table_col, v)")
      entropyMelted(cols.map(c => s"$t.$c"), melted)
    }.reduce(_ unionAll _)

  /** One [[entropy]] row for a single melted value column `v` —
    * spec-level entry point into the shared melt path. */
  private[graft] def entropyOfCol(label: String, vals: DataFrame): DataFrame =
    entropyMelted(Seq(label), vals.select(lit(label).as("table_col"), col("v")))

  /** [[entropy]] core over a pre-melted (table_col, v) frame: one count
    * aggregate, one table_col-partitioned window for the per-column
    * total/cardinality (partitions bounded by |V|), one per-column term
    * sum. `labels` left-joins the result so a column whose values are
    * all NULL still emits its contract row (n_values=0, n_total=0,
    * NULL entropies) instead of vanishing. */
  private[graft] def entropyMelted(labels: Seq[String], melted: DataFrame): DataFrame = {
    val s = melted.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"table_col")
    val present = melted.filter($"v".isNotNull)
      .groupBy($"table_col", $"v").agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum($"cnt").over(w))
      .withColumn("n_values", count(lit(1)).over(w))
      .select($"table_col", $"n_values", $"total", expr(
        """CAST(round((CAST(cnt AS DOUBLE) / total)
          |  * -log(2.0D, CAST(cnt AS DOUBLE) / total) * 1000000) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("term"))
      .groupBy($"table_col", $"n_values", $"total")
      .agg(sum($"term").as("entropy_micro_bits"))
      .select($"table_col", $"n_values", $"total".as("n_total"),
        $"entropy_micro_bits",
        expr("CAST(round(log(2.0D, CAST(n_values AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("max_entropy_micro_bits"))
    labels.toDF("table_col").join(broadcast(present), Seq("table_col"), "left")
      .select($"table_col",
        coalesce($"n_values", lit(0L)).as("n_values"),
        coalesce($"n_total", lit(0L)).as("n_total"),
        $"entropy_micro_bits", $"max_entropy_micro_bits")
  }

  /** DuckDB twin of [[entropy]] — ln(x)/ln(2) mirrors Spark's
    * log(2.0, x) bit-for-bit (the lmBits parity idiom), same per-term
    * micro-bit snap before the integer sum. The CASE/coalesce guards
    * mirror the Spark side's labels left-join: a fully-NULL column
    * yields (label, 0, 0, NULL, NULL) on both engines instead of the
    * engine-specific empty-aggregate defaults. */
  val entropyOracle: String =
    EntropyCols.map { case (t, c) =>
      s"""SELECT '$t.$c' AS table_col,
         |  CAST(count(*) AS BIGINT) AS n_values,
         |  CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_total,
         |  CAST(sum(CAST(round((CAST(cnt AS DOUBLE) / total)
         |    * -(ln(CAST(cnt AS DOUBLE) / total) / ln(2))
         |    * 1000000) AS BIGINT)) AS BIGINT) AS entropy_micro_bits,
         |  CASE WHEN count(*) = 0 THEN NULL
         |    ELSE CAST(round((ln(CAST(count(*) AS DOUBLE)) / ln(2)) * 1000000)
         |      AS BIGINT) END AS max_entropy_micro_bits
         |FROM (SELECT $c AS v, count(*) AS cnt,
         |        sum(count(*)) OVER () AS total
         |      FROM $t WHERE $c IS NOT NULL GROUP BY $c)""".stripMargin
    }.mkString("\nUNION ALL\n")
  /** ABC cumulative-share cuts in micros: A carries the first 80 % of
    * revenue, B the next 15 %, C the tail. */
  val AbcACutMicros = 800000L
  val AbcBCutMicros = 950000L

  /** Per-nation ABC (Pareto) customer classification — the 80/15/5
    * inventory-analysis classic ([[rfmSegments]]' portfolio sibling):
    * within each nation, rank customers by lifetime revenue and classify
    * by the cumulative share of revenue ABOVE them — class A customers
    * carry the first [[AbcACutMicros]] of each nation's mass.
    * Classification uses the share BEFORE the customer (so the top
    * customer is always A, even alone above the cut) — the standard
    * convention, and knife-edge-free because shares are integer micros.
    *
    * Scale shape: one groupBy-customer aggregate, one broadcast of the
    * ≤ |nations|-row totals, then ONE window PARTITIONED BY NATION over
    * the per-customer frame — bounded partitions by construction (a
    * nation's customer list), never a single-partition global sort.
    * (cents desc, custkey) is a total order, so the running sum is
    * frame-ambiguity-free on both engines. */
  def abcPareto(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val per = Tables.orders(s, d)
      .select($"o_custkey".as("custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy($"custkey").agg(sum($"cents").as("cents"))
      .join(Tables.customer(s, d)
        .select($"c_custkey".as("custkey"), $"c_nationkey".as("nationkey")),
        "custkey")
    val totals = per.groupBy($"nationkey").agg(sum($"cents").as("total"))
    val w = Window.partitionBy($"nationkey")
      .orderBy($"cents".desc, $"custkey".asc)
    per.join(broadcast(totals), "nationkey")
      .withColumn("cum_cents", sum($"cents").over(w))
      .withColumn("share_before_micros",
        expr("((cum_cents - cents) * 1000000) div total"))
      .withColumn("abc_class",
        when($"share_before_micros" < AbcACutMicros, "A")
          .when($"share_before_micros" < AbcBCutMicros, "B")
          .otherwise("C"))
      .select($"custkey", $"nationkey", $"cents", $"cum_cents",
        $"share_before_micros", $"abc_class")
  }

  /** DuckDB twin of [[abcPareto]] — same total order, integer shares,
    * and before-share classification. */
  val abcParetoOracle: String =
    s"""WITH per AS (SELECT o.o_custkey AS custkey, c.c_nationkey AS nationkey,
       |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  GROUP BY o.o_custkey, c.c_nationkey),
       |t AS (SELECT nationkey, CAST(sum(cents) AS BIGINT) AS total
       |  FROM per GROUP BY nationkey),
       |r AS (SELECT p.custkey, p.nationkey, p.cents, t.total,
       |    CAST(sum(p.cents) OVER (PARTITION BY p.nationkey
       |      ORDER BY p.cents DESC, p.custkey ASC) AS BIGINT) AS cum_cents
       |  FROM per p JOIN t USING (nationkey))
       |SELECT custkey, nationkey, cents, cum_cents,
       |  CAST(((cum_cents - cents) * 1000000) // total AS BIGINT)
       |    AS share_before_micros,
       |  CASE WHEN ((cum_cents - cents) * 1000000) // total < $AbcACutMicros THEN 'A'
       |       WHEN ((cum_cents - cents) * 1000000) // total < $AbcBCutMicros THEN 'B'
       |       ELSE 'C' END AS abc_class
       |FROM r""".stripMargin

  // ---------------------------------------------- numeric correlation matrix
  /** Lineitem numeric columns profiled by [[correlations]], with their
    * exact integer encodings (cents / basis points — the
    * [[rfmSegments]] money discipline). */
  val CorrCols: Seq[(String, String)] = Seq(
    "qty_c"   -> "CAST(round(l_quantity * 100) AS DECIMAL(38,0))",
    "price_c" -> "CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))",
    "disc_bp" -> "CAST(round(l_discount * 10000) AS DECIMAL(38,0))",
    "tax_bp"  -> "CAST(round(l_tax * 10000) AS DECIMAL(38,0))")

  /** Pairwise Pearson correlation matrix over lineitem's numeric columns
    * — the column-profiling step after [[profileLineitem]]'s univariate
    * stats: which measures move together (price↑quantity? tax↔discount?)
    * before anyone trusts a single-column model of the table.
    *
    * Every moment (Σx, Σx², Σxy) accumulates EXACTLY in DECIMAL(38,0) /
    * HUGEINT from the first multiply ([[Events.anomalyWindowsOf]]'s
    * headroom discipline — Σx² of cents at warehouse row counts crosses
    * 2^63 and non-ANSI long arithmetic would wrap silently). Only the
    * final r = (NΣxy−ΣxΣy) / (√(NΣx²−(Σx)²)·√(NΣy²−(Σy)²)) leaves
    * integer space: each factor is one exact-integer→double cast (both
    * engines round-to-nearest the SAME integer), one sqrt, one divide —
    * identical IEEE ops, then rounded to 6 dp. Degenerate (zero-variance)
    * columns yield NULL, not a fabricated r.
    *
    * Scale shape: ONE scan, one single-row aggregate (all 4+4+6 moments
    * map-side combined), then the 6 pair rows EXPLODE off that one row —
    * one array-of-structs projection, never a re-aggregation. (The first
    * cut union-ed six `select`s off the shared `moments` frame; Spark
    * does not share subplans across a union, so the census showed SIX
    * shuffle exchanges = six full DECIMAL(38,0) lineitem scans for
    * identical moments. The explode keeps the plan at census 1/0.)
    * Nothing widens with volume. */
  def correlations(s: SparkSession, d: String): DataFrame =
    correlationsOf(Tables.lineitem(s, d))

  private[graft] def correlationsOf(li: DataFrame): DataFrame = {
    val s = li.sparkSession
    import s.implicits._
    val base = li.select(CorrCols.map { case (n, e) => expr(e).as(n) }: _*)
    val names = CorrCols.map(_._1)
    val moments = base.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      names.flatMap(c => Seq(
        sum(col(c)).as(s"s_$c"),
        sum(col(c) * col(c)).as(s"q_$c"))) ++
      names.combinations(2).toSeq.map { case Seq(a, b) =>
        sum(col(a) * col(b)).as(s"p_${a}_$b") }: _*)
    val pairRows = names.combinations(2).toSeq.map { case Seq(a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        $"n".cast("long").as("n_rows"),
        expr(
          s"""CASE WHEN n * q_$a - s_$a * s_$a = 0
             |       OR n * q_$b - s_$b * s_$b = 0 THEN NULL
             |  ELSE round(CAST(n * p_${a}_$b - s_$a * s_$b AS DOUBLE) /
             |    (sqrt(CAST(n * q_$a - s_$a * s_$a AS DOUBLE)) *
             |     sqrt(CAST(n * q_$b - s_$b * s_$b AS DOUBLE))), 6)
             |END""".stripMargin).as("pearson_r"))
    }
    moments.select(explode(array(pairRows: _*)).as("r")).select($"r.*")
  }

  /** DuckDB twin of [[correlations]] — HUGEINT moments, the same
    * exact-int→double casts, sqrts, divide, and 6 dp round. */
  val correlationsOracle: String = {
    val enc = Seq(
      "qty_c"   -> "CAST(CAST(round(l_quantity * 100) AS BIGINT) AS HUGEINT)",
      "price_c" -> "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)",
      "disc_bp" -> "CAST(CAST(round(l_discount * 10000) AS BIGINT) AS HUGEINT)",
      "tax_bp"  -> "CAST(CAST(round(l_tax * 10000) AS BIGINT) AS HUGEINT)")
    val names = enc.map(_._1)
    val sums = names.flatMap(c =>
      Seq(s"sum($c) AS s_$c", s"sum($c * $c) AS q_$c")) ++
      names.combinations(2).map { case Seq(a, b) =>
        s"sum($a * $b) AS p_${a}_$b" }
    val rows = names.combinations(2).toSeq.map { case Seq(a, b) =>
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n_rows,
         |  CASE WHEN n * q_$a - s_$a * s_$a = 0
         |         OR n * q_$b - s_$b * s_$b = 0 THEN NULL
         |    ELSE round(CAST(n * p_${a}_$b - s_$a * s_$b AS DOUBLE) /
         |      (sqrt(CAST(n * q_$a - s_$a * s_$a AS DOUBLE)) *
         |       sqrt(CAST(n * q_$b - s_$b * s_$b AS DOUBLE))), 6)
         |  END AS pearson_r FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH b AS (SELECT ${enc.map { case (n, e) => s"$e AS $n" }.mkString(", ")}
       |  FROM lineitem),
       |m AS (SELECT CAST(count(*) AS HUGEINT) AS n, ${sums.mkString(", ")}
       |  FROM b)
       |$rows""".stripMargin
  }
}
