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
}
