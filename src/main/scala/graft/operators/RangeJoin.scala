package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Banded range join — "rows within a window of each other" without a
  * nested-loop join.
  *
  * A plain `ON a.user = b.user AND abs(a.ts - b.ts) <= w` join makes Spark
  * fall back to a per-key nested loop (quadratic in events per user). The
  * scalable rewrite bins timestamps into width-w buckets: a left row in
  * bin B can only match right rows in bins B-1..B+1, so the left side is
  * exploded 3× and the join becomes an equi-join on (user, bin) with the
  * exact range predicate applied as a cheap residual filter. Each true
  * pair matches exactly once (the right row's single bin is probed by
  * exactly one of the left row's three). Shuffle keys stay (user, bin) —
  * bounded fan-out, skew-safe under AQE.
  */
object RangeJoin {

  private val WindowUs: Long = 300L * 1000000L // ±300 s in microseconds

  /** For each error event, the number of click events by the same user
    * within ±300 s (errors with none are kept with 0). */
  def errorsNearClicks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, d)
    val errors = events.filter($"event_type" === "error")
      .select($"event_id", $"user_id", unix_micros($"ts").as("tus"))
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), unix_micros($"ts").as("c_tus"))
      .withColumn("bin", floor($"c_tus" / WindowUs))
    val probed = errors
      .withColumn("bin", explode(array(
        floor($"tus" / WindowUs) - 1,
        floor($"tus" / WindowUs),
        floor($"tus" / WindowUs) + 1)))
    val matched = probed.join(clicks,
        probed("user_id") === clicks("c_user") && probed("bin") === clicks("bin") &&
          abs(probed("tus") - clicks("c_tus")) <= WindowUs)
      .groupBy($"event_id".as("m_event_id"))
      .agg(count(lit(1)).as("n_clicks"))
    errors.join(matched, $"event_id" === $"m_event_id", "left")
      .select($"event_id", $"user_id",
        coalesce($"n_clicks", lit(0L)).as("nearby_clicks"))
  }

  val errorsNearClicksOracle: String =
    """SELECT e.event_id, e.user_id,
      | CAST(count(c.ts) AS BIGINT) AS nearby_clicks
      |FROM events e LEFT JOIN events c
      |  ON c.user_id = e.user_id AND c.event_type = 'click'
      | AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= 300000000
      |WHERE e.event_type = 'error'
      |GROUP BY e.event_id, e.user_id""".stripMargin
}
