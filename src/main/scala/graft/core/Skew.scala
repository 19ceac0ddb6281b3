package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys at scale.
  *
  * AQE's skew-join splitting handles most runtime skew; these helpers cover
  * the two cases it does not: (a) a single aggregation key so hot its
  * partial-aggregate partition still overwhelms one task, and (b) a
  * broadcast-ineligible join with a known hot-key set.
  *
  * Both are algebraic rewrites — results are identical to the unsalted
  * forms (asserted in SkewSpec), only the shuffle layout changes.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (keys, salt) first so the hot
    * key's rows spread across `saltBuckets` reducers, then merge the
    * partials. Supports the algebraic aggregates (sum/count/min/max);
    * avg = salted sum + salted count at the call site.
    *
    * The salt must be uncorrelated with the keys and need not be stable
    * across runs (it never escapes the first shuffle): a seeded `rand` is
    * the standard choice.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[(String, String)],
                saltBuckets: Int = 16, seed: Long = 42L): DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(seed) * saltBuckets).cast("int"))
    val p1 = aggs.zipWithIndex.map { case ((c, f), i) => expr(s"$f($c)").as(s"__p$i") }
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(p1.head, p1.tail: _*)
    val merge = aggs.zipWithIndex.map { case ((c, f), i) =>
      val mergeFn = if (f == "count") "sum" else f // counts merge by summing
      expr(s"$mergeFn(__p$i)").as(s"${f}_$c")
    }
    phase1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** [[saltedAgg]] over the events table, externally verified: sum/count/
    * min/max of value per event_type through the salted two-phase rewrite
    * must equal the plain GROUP BY (the DuckDB oracle IS the unsalted
    * form — algebraic-identity proof at the gate, not just in SkewSpec). */
  def saltedAggQuery(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    saltedAgg(graft.core.Tables.events(s, d).select($"event_type", $"value"),
        Seq("event_type"),
        Seq(("value", "sum"), ("value", "count"), ("value", "min"), ("value", "max")))
      .select($"event_type", round($"sum_value", 2).as("sum_value"),
        $"count_value", $"min_value", $"max_value")
  }

  val saltedAggOracle: String =
    """SELECT event_type, round(sum(value), 2) AS sum_value,
      | count(value) AS count_value, min(value) AS min_value,
      | max(value) AS max_value
      |FROM events GROUP BY 1""".stripMargin

  /** [[replicatedJoin]] over lineitem ⋈ orders, externally verified: the
    * hot-key replicated join must equal the plain inner join (the DuckDB
    * oracle IS the unsalted join — same algebraic-identity-at-the-gate
    * treatment as [[saltedAggQuery]]). Hot keys: the first three order
    * keys, standing in for a measured hot-key set. */
  def replicatedJoinQuery(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = graft.core.Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val o = graft.core.Tables.orders(s, d)
      .select($"o_orderkey".as("l_orderkey"), $"o_custkey")
    replicatedJoin(li, o, "l_orderkey", hotKeys = Seq(1L, 2L, 3L))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_items"), round(sum($"l_quantity"), 2).as("sum_qty"))
  }

  val replicatedJoinOracle: String =
    """SELECT o_custkey, count(*) AS n_items,
      | round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Hot-key replicated join: rows of `left` whose key is in `hotKeys` get
    * a random salt in [0, saltBuckets); `right` is exploded `saltBuckets`×
    * for those keys so every salted left row still finds its match. Cold
    * keys join 1:1 with salt 0. Exact inner-join semantics, but the hot
    * key's probe rows spread over `saltBuckets` tasks. */
  def replicatedJoin(left: DataFrame, right: DataFrame, key: String,
                     hotKeys: Seq[Any], saltBuckets: Int = 8,
                     seed: Long = 42L): DataFrame = {
    val hot = array(hotKeys.map(lit): _*) // Seq[Any] has no typedLit encoder
    val l = left.withColumn("__salt",
      when(array_contains(hot, col(key)),
        (rand(seed) * saltBuckets).cast("int")).otherwise(lit(0)))
    val r = right.withColumn("__salts",
      when(array_contains(hot, col(key)),
        sequence(lit(0), lit(saltBuckets - 1))).otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salts"))).drop("__salts")
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
