package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** As-of (point-in-time) join — for each left row, the most recent right
  * row with `right.ts <= left.ts` within the same partition key.
  *
  * Implementation is the union-sort trick: tag both sides, union, one
  * hash-shuffle on the key + one sort on (ts, side, id), then a running
  * `last(ignoreNulls)` carries the latest right payload forward onto left
  * rows. At 100 TB this is ONE exchange + sort per side and no range
  * explosion — the naive per-key nested loop or range-join rewrite is
  * quadratic in events per key. (DuckDB's native ASOF JOIN is the oracle's
  * formulation; tie-break at equal ts is rights-first then larger id,
  * mirrored on both sides.)
  */
object AsOf {

  /** Generic helper: attach `valueCol` of the latest right row at-or-before
    * each left row's `tsCol`, per `key`. Left/right must share the key and
    * ts column names; right contributes `valueCol` only. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               idCol: String, valueCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__val", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(key), col(tsCol), col(idCol), col(valueCol))
      .withColumn("__side", lit(0))
      .withColumn("__val", col(valueCol))
      .drop(valueCol)
    val unioned = l.select(col(key), col(tsCol), col(idCol), col("__side"), col("__val"))
      .unionByName(r)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__side").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__matched", last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__val")
  }

  /** Each purchase event joined to the user's most recent prior (or
    * simultaneous) view event. */
  def purchaseToLastView(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, d)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val views = events.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id", $"event_id".as("view_id"))
    asOfJoin(purchases, views, "user_id", "ts", "event_id", "view_id")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"__matched".as("view_id"))
  }

  /** Forward as-of: attach `valueCol` of the EARLIEST right row
    * at-or-after each left row's ts, per key — the same union-sort trick
    * scanned in DESCENDING time, so the running carry holds the nearest
    * FUTURE right. Tie-break at equal ts: rights match (side before
    * left), smallest right id wins (ids scan descending, so the last
    * carried is the smallest). One exchange + sort, no range explosion. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      tsCol: String, idCol: String, valueCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__val", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(key), col(tsCol), col(idCol), col(valueCol))
      .withColumn("__side", lit(0))
      .withColumn("__val", col(valueCol))
      .drop(valueCol)
    val unioned = l.select(col(key), col(tsCol), col(idCol), col("__side"), col("__val"))
      .unionByName(r)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).desc, col("__side").asc, col(idCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__matched", last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__val")
  }

  /** Each purchase event joined to the user's NEXT view at-or-after it —
    * the post-conversion-behavior query ([[purchaseToLastView]]'s
    * forward twin; together they bracket every conversion). */
  def purchaseToNextView(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, d)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val views = events.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id", $"event_id".as("view_id"))
    asOfJoinForward(purchases, views, "user_id", "ts", "event_id", "view_id")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"__matched".as("view_id"))
  }

  /** DuckDB twin of [[purchaseToNextView]] — the descending-scan mirror
    * of [[purchaseToLastViewOracle]]. */
  val purchaseToNextViewOracle: String =
    """WITH u AS (
      |  SELECT user_id, ts, 1 AS side, event_id, CAST(NULL AS BIGINT) AS view_id
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, 0, event_id, event_id
      |  FROM events WHERE event_type = 'view'),
      |w AS (
      |  SELECT user_id, event_id, side,
      |    last_value(view_id IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts DESC, side ASC, event_id DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched
      |  FROM u)
      |SELECT event_id AS purchase_id, user_id, matched AS view_id
      |FROM w WHERE side = 1""".stripMargin

  val purchaseToLastViewOracle: String =
    """WITH u AS (
      |  SELECT user_id, ts, 1 AS side, event_id, CAST(NULL AS BIGINT) AS view_id
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, 0, event_id, event_id
      |  FROM events WHERE event_type = 'view'),
      |w AS (
      |  SELECT user_id, event_id, side,
      |    last_value(view_id IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts ASC, side ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched
      |  FROM u)
      |SELECT event_id AS purchase_id, user_id, matched AS view_id
      |FROM w WHERE side = 1""".stripMargin
}
