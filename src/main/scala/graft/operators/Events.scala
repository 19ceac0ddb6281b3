package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Batch event analytics over the `events` table: the ordered conversion
  * funnel and the cohort-retention matrix — the two classic product
  * queries a clickstream corpus answers before any of it becomes
  * training data, and (for the pipeline itself) the shapes that audit a
  * stream of ingest events.
  *
  * Both operators are keyed per-user aggregation chains: every shuffle in
  * the funnel and the cohort build is on `user_id`, so at cluster scale
  * the chained aggregates and joins are co-partitioned (Exchange reuse
  * across steps, no re-shuffle between the step-1 aggregate and the
  * step-2 join that consumes it) and a celebrity user's event list is
  * reduced map-side — the state per user is O(1) (a handful of
  * timestamps), never the raw event list.
  */
object Events {

  /** Funnel step names in order. The funnel is STRICTLY sequential: step
    * k's timestamp is the user's earliest step-k event at-or-after their
    * step-(k−1) conversion instant (the "first touch after previous
    * conversion" discipline — re-views after the click don't reset it). */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Ordered conversion funnel view → click → purchase.
    *
    * Output: one row per step — `step` (1-based), `step_name`,
    * `n_users` reaching it, and `avg_lag_micros` = integer-mean
    * microseconds from the previous step's conversion instant (NULL for
    * step 1). All arithmetic is integer (epoch micros, `div`), so the
    * DuckDB twin is bit-exact with no float or round-half edge.
    *
    * Scale shape: three groupBy-user aggregates chained by two
    * user-keyed joins — each step's frame is one row per converted user
    * (timestamps only). The per-step summary rows are single-row
    * aggregates unioned at the end; nothing about the plan widens with
    * event volume beyond the initial scans, and the filter on
    * `event_type` is pushed to each scan so step k reads only its own
    * event class. */
  def eventFunnel(s: SparkSession, d: String): DataFrame =
    eventFunnelOf(Tables.events(s, d))

  private[graft] def eventFunnelOf(ev0: DataFrame): DataFrame = {
    val s = ev0.sparkSession
    import s.implicits._
    val ev = ev0.select($"user_id", $"event_type", $"ts")
    // step 1: first view per user
    val t1 = ev.filter($"event_type" === FunnelSteps(0))
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    // step 2: first click at-or-after the first view (t1 is constant per
    // user, so min() just carries it through the aggregate)
    val t2 = ev.filter($"event_type" === FunnelSteps(1))
      .join(t1, "user_id").filter($"ts" >= $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"), min($"t1").as("t1"))
    // step 3: first purchase at-or-after the click conversion
    val t3 = ev.filter($"event_type" === FunnelSteps(2))
      .join(t2.select($"user_id", $"t2"), "user_id").filter($"ts" >= $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"), min($"t2").as("t2"))
    def lagMicros(hi: String, lo: String) =
      unix_micros(col(hi)) - unix_micros(col(lo))
    val s1 = t1.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("step"), lit(FunnelSteps(0)).as("step_name"),
        $"n_users", lit(null).cast("long").as("avg_lag_micros"))
    val s2 = t2.agg(count(lit(1)).as("n_users"),
        sum(lagMicros("t2", "t1")).as("lag_sum"))
      .select(lit(2).as("step"), lit(FunnelSteps(1)).as("step_name"),
        $"n_users", expr("lag_sum div nullif(n_users, 0)").as("avg_lag_micros"))
    val s3 = t3.agg(count(lit(1)).as("n_users"),
        sum(lagMicros("t3", "t2")).as("lag_sum"))
      .select(lit(3).as("step"), lit(FunnelSteps(2)).as("step_name"),
        $"n_users", expr("lag_sum div nullif(n_users, 0)").as("avg_lag_micros"))
    s1.unionAll(s2).unionAll(s3)
  }

  /** DuckDB twin of [[eventFunnel]] — the same chained conditional-min
    * CTEs; epoch_us and `//` mirror unix_micros and `div` exactly on the
    * all-positive lag domain. */
  val eventFunnelOracle: String =
    s"""WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
       |    WHERE event_type = '${FunnelSteps(0)}' GROUP BY user_id),
       |t2 AS (SELECT e.user_id, min(e.ts) AS t2, min(t1.t1) AS t1
       |    FROM events e JOIN t1 ON e.user_id = t1.user_id
       |    WHERE e.event_type = '${FunnelSteps(1)}' AND e.ts >= t1.t1
       |    GROUP BY e.user_id),
       |t3 AS (SELECT e.user_id, min(e.ts) AS t3, min(t2.t2) AS t2
       |    FROM events e JOIN t2 ON e.user_id = t2.user_id
       |    WHERE e.event_type = '${FunnelSteps(2)}' AND e.ts >= t2.t2
       |    GROUP BY e.user_id)
       |SELECT 1 AS step, '${FunnelSteps(0)}' AS step_name,
       |  count(*) AS n_users, CAST(NULL AS BIGINT) AS avg_lag_micros FROM t1
       |UNION ALL
       |SELECT 2, '${FunnelSteps(1)}', count(*),
       |  CAST(sum(epoch_us(t2) - epoch_us(t1)) // nullif(count(*), 0) AS BIGINT) FROM t2
       |UNION ALL
       |SELECT 3, '${FunnelSteps(2)}', count(*),
       |  CAST(sum(epoch_us(t3) - epoch_us(t2)) // nullif(count(*), 0) AS BIGINT) FROM t3""".stripMargin

  /** Cohort-retention matrix: users cohorted by their FIRST event date;
    * for each (cohort_date, day_offset) cell, how many of that cohort's
    * users were active offset days later. The output is bounded by
    * |days|² whatever the event volume.
    *
    * Scale shape: one groupBy-user aggregate for the cohort date, one
    * user-keyed join back onto the (user, active-date) distinct frame
    * (co-partitioned with the aggregate that feeds it), then a count
    * aggregate on the bounded (cohort, offset) key. The per-user
    * active-date set is deduplicated BEFORE the cell count, so a user
    * firing a million events in one day contributes one row past the
    * first aggregate. */
  def retentionCohorts(s: SparkSession, d: String): DataFrame =
    retentionCohortsOf(Tables.events(s, d))

  private[graft] def retentionCohortsOf(ev0: DataFrame): DataFrame = {
    val s = ev0.sparkSession
    import s.implicits._
    val userDays = ev0.select($"user_id", to_date($"ts").as("day")).distinct()
    val cohorts = userDays.groupBy($"user_id").agg(min($"day").as("cohort_date"))
    userDays.join(cohorts, "user_id")
      .select($"cohort_date", datediff($"day", $"cohort_date").as("day_offset"))
      .groupBy($"cohort_date", $"day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Windowed count-spike anomaly detection: hourly event counts per
    * type, flagged where the count exceeds the type's mean by more than
    * 3 standard deviations — the ingest-monitoring query that catches a
    * crawler loop or a broken dedup upstream before the batch lands in
    * training data.
    *
    * The z-test is INTEGER-EXACT: `(c·N − S)² > 9·(Q·N − S²)` (both
    * sides in DECIMAL(38,0) / HUGEINT) is `(c − μ)² > (3σ)²` with the
    * N² denominators cleared — no float mean, no sqrt, no knife edge, so
    * the DuckDB twin matches row-for-row on the flag boundary.
    *
    * Scale shape: one map-side-combined aggregate to hourly counts
    * (bounded by |types|·|hours|), one |types|-row broadcast of the
    * (N, S, Q) moment table back onto it. The raw event volume is
    * touched exactly once. */
  def anomalyWindows(s: SparkSession, d: String): DataFrame =
    anomalyWindowsOf(Tables.events(s, d))

  private[graft] def anomalyWindowsOf(ev0: DataFrame): DataFrame = {
    val s = ev0.sparkSession
    import s.implicits._
    val wc = ev0
      .groupBy($"event_type", date_trunc("hour", $"ts").as("window_start"))
      .agg(count(lit(1)).as("n_events"))
    val moments = wc.groupBy($"event_type").agg(
      count(lit(1)).as("n_w"),
      sum($"n_events").as("s"),
      // q accumulates in DECIMAL(38,0) from the first multiply: a
      // sustained ~1e8-events/hour type crosses 2^63 on sum(c²) and
      // Spark's non-ANSI long arithmetic would wrap SILENTLY while the
      // oracle's HUGEINT keeps going — the headroom the z-test below
      // claims has to start here, not at the comparison cast
      sum($"n_events".cast("decimal(38,0)") * $"n_events").as("q"))
    wc.join(broadcast(moments), "event_type")
      .filter(expr(
        "(n_events * n_w - s) > 0 AND " +
          "CAST(n_events * n_w - s AS DECIMAL(38,0)) * (n_events * n_w - s) > " +
          "9 * (CAST(q AS DECIMAL(38,0)) * n_w - CAST(s AS DECIMAL(38,0)) * s)"))
      .select($"event_type", $"window_start", $"n_events",
        expr("(s * 1000) div n_w").as("mean_milli"))
  }

  /** DuckDB twin of [[anomalyWindows]] — HUGEINT mirrors the engine's
    * DECIMAL(38,0) headroom on the squared z-test. */
  val anomalyWindowsOracle: String =
    """WITH wc AS (SELECT event_type, date_trunc('hour', ts) AS window_start,
      |    count(*) AS c FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, count(*) AS n_w,
      |    CAST(sum(c) AS BIGINT) AS s,
      |    sum(CAST(c AS HUGEINT) * c) AS q
      |  FROM wc GROUP BY event_type)
      |SELECT wc.event_type, wc.window_start, wc.c AS n_events,
      |  CAST((st.s * 1000) // st.n_w AS BIGINT) AS mean_milli
      |FROM wc JOIN st USING (event_type)
      |WHERE (wc.c * st.n_w - st.s) > 0
      |  AND CAST(wc.c * st.n_w - st.s AS HUGEINT) * (wc.c * st.n_w - st.s)
      |      > 9 * (CAST(st.q AS HUGEINT) * st.n_w - CAST(st.s AS HUGEINT) * st.s)""".stripMargin

  /** Event-type Markov transition matrix: for each ordered pair of
    * consecutive events WITHIN a user's timeline, count transitions and
    * row-normalize to micro-unit probabilities — the first-order
    * behavior model (what follows a view?) and, pipeline-side, the
    * session-shape fingerprint that changes when an upstream producer
    * breaks.
    *
    * "Consecutive" is total-ordered by (ts, event_id) so ties are
    * deterministic. Probabilities are integer micros
    * (`c · 1e6 div row_total`) — no float division anywhere.
    *
    * Scale shape: ONE window pass partitioned by `user_id` (per-user
    * state is a single lag row, nothing accumulates), then a
    * map-side-combined count on the |types|² transition key and a
    * |types|-row broadcast for the normalizer. A hot user's timeline is
    * a single partition's sort, not a shuffle explosion — the
    * skew-resistant sessionizer's range-partition trick applies if one
    * user owns half the stream (documented there). */
  def typeTransitions(s: SparkSession, d: String): DataFrame =
    typeTransitionsOf(Tables.events(s, d))

  private[graft] def typeTransitionsOf(ev0: DataFrame): DataFrame = {
    val s = ev0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = ev0
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy($"from_type").agg(sum($"n").as("row_total"))
    trans.join(broadcast(totals), "from_type")
      .select($"from_type", $"to_type", $"n",
        expr("(n * 1000000) div row_total").as("p_micros"))
  }

  /** Hour width of the deterministic timeline buckets the skew-resistant
    * transition counter splits each user's history into. */
  val TransBucketUs: Long = 3600L * 1000000L

  /** Skew-resistant [[typeTransitions]]: identical output, no hot-user
    * straggler. The plain form sorts each user's WHOLE timeline in one
    * window partition — a user owning half the stream becomes one task
    * (measured: 2.3× at 50 % heat, sf1). This form splits every
    * timeline into FIXED hour buckets:
    *
    *   1. within-(user, bucket) windows emit the in-bucket consecutive
    *      pairs — parallelism = users × active hours, and a bucket holds
    *      at most one hour of one user's events regardless of how hot
    *      the user is;
    *   2. a per-(user, bucket) aggregate keeps only each bucket's FIRST
    *      and LAST event (min_by/max_by on the (ts, event_id) order);
    *   3. a per-user window over that O(hours)-row frame stitches the
    *      boundary pairs (bucket's last → next non-empty bucket's first).
    *
    * Fixed bucket edges make the split DETERMINISTIC (range-partition
    * sampling would re-draw boundaries per pass), the transition
    * multiset is split-invariant, and nothing is collected — the
    * [[graft.streaming.EventStream.sessionizeSkewResistant]] design
    * applied to the Markov counter. */
  def typeTransitionsSkewResistant(s: SparkSession, d: String): DataFrame =
    typeTransitionsSkewResistantOf(Tables.events(s, d))

  private[graft] def typeTransitionsSkewResistantOf(ev0: DataFrame): DataFrame = {
    val s = ev0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = ev0.select($"user_id", $"event_type", $"ts", $"event_id",
      expr(s"unix_micros(ts) div $TransBucketUs").as("bucket"))
    val wIn = Window.partitionBy($"user_id", $"bucket").orderBy($"ts", $"event_id")
    val inBucket = ev
      .withColumn("next_type", lead($"event_type", 1).over(wIn))
      .filter($"next_type".isNotNull)
      .select($"event_type".as("from_type"), $"next_type".as("to_type"))
    val edges = ev.groupBy($"user_id", $"bucket").agg(
      min_by($"event_type", struct($"ts", $"event_id")).as("first_type"),
      max_by($"event_type", struct($"ts", $"event_id")).as("last_type"))
    val wU = Window.partitionBy($"user_id").orderBy($"bucket")
    val boundary = edges
      .withColumn("next_first", lead($"first_type", 1).over(wU))
      .filter($"next_first".isNotNull)
      .select($"last_type".as("from_type"), $"next_first".as("to_type"))
    val trans = inBucket.unionAll(boundary)
      .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
    val totals = trans.groupBy($"from_type").agg(sum($"n").as("row_total"))
    trans.join(broadcast(totals), "from_type")
      .select($"from_type", $"to_type", $"n",
        expr("(n * 1000000) div row_total").as("p_micros"))
  }

  /** DuckDB twin of [[typeTransitions]] — same (ts, event_id) total
    * order, same integer micro-probabilities. */
  val typeTransitionsOracle: String =
    """WITH tr AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM tr
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n,
      |  CAST((c.n * 1000000) // t.row_total AS BIGINT) AS p_micros
      |FROM c JOIN t USING (from_type)""".stripMargin

  /** DuckDB twin of [[retentionCohorts]]. */
  val retentionCohortsOracle: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_date FROM ud GROUP BY user_id)
      |SELECT c.cohort_date,
      |  CAST(date_diff('day', c.cohort_date, ud.day) AS INTEGER) AS day_offset,
      |  count(*) AS n_users
      |FROM ud JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- multi-touch attribution
  /** Attribution lookback window in days: touches earlier than this
    * before the purchase carry no credit. */
  val AttribWindowDays = 7
  /** Touch event classes eligible for credit. */
  val AttribTouchTypes: Seq[String] = Seq("view", "click")

  /** Multi-touch revenue attribution — which touch class (view / click)
    * "caused" each purchase, under the three standard models at once:
    * first-touch, last-touch, and linear (even split). The marketing
    * query every clickstream warehouse answers weekly, and structurally
    * the credit-assignment shape (conversion joined back to its causal
    * window) that data-pipeline lineage auditing reuses.
    *
    * Contract: a purchase's touches are the user's view/click events in
    * `[purchase − `[[AttribWindowDays]]`d, purchase)`. First/last are
    * picked by the total order (ts, event_id) — no timestamp-tie
    * nondeterminism. Money is exact integer cents; the linear split is
    * `cents div n` per touch with the remainder assigned to the LAST
    * touch, so every model credits EXACTLY the purchase total (the
    * [[graft.operators.Corpus.epochPlan]] budget-exhaustion discipline).
    * Purchase cents ≥ 0 BY CONTRACT (the hitsOracle positive-domain
    * note): Spark's `div` truncates toward zero where DuckDB's `//`
    * floors, so a negative total (a refund row) would break both the
    * exact-total property and engine parity — refunds belong in a
    * signed-ledger operator, not a credit split. The corpus generator
    * emits value ≥ 0; a caller feeding refunds must pre-filter.
    * Purchases with no touch in the window credit a 'direct' pseudo-class
    * under every model.
    *
    * Output: (model, touch_type, credited_cents, n_purchases), ≤ 3·3
    * rows.
    *
    * Scale shape: one user-keyed equi-join with the window as a residual
    * range predicate (the [[RangeJoin]] class — per-user candidate
    * volume is bounded by the 7-day window, not total history), then
    * purchase-keyed aggregates (map-side combined) and a ≤ 9-row final
    * aggregate. No global window, no driver traffic. */
  def attribution(s: SparkSession, d: String): DataFrame =
    attributionOf(Tables.events(s, d))

  private[graft] def attributionOf(ev0: DataFrame): DataFrame = {
    val s = ev0.sparkSession
    import s.implicits._
    val touches = ev0.filter($"event_type".isin(AttribTouchTypes: _*))
      .select($"user_id", $"ts".as("tts"), $"event_id".as("tid"),
        $"event_type".as("ttype"))
    val purch = ev0.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"event_id".as("pid"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val cand = purch.join(touches, "user_id")
      .filter($"tts" < $"pts" &&
        $"tts" >= $"pts" - expr(s"INTERVAL $AttribWindowDays DAYS"))
    // per purchase: touch count, first/last touch class by (ts, id)
    val per = cand.groupBy($"pid").agg(
        count(lit(1)).as("n"), min($"cents").as("cents"),
        min_by($"ttype", struct($"tts", $"tid")).as("first_type"),
        max_by($"ttype", struct($"tts", $"tid")).as("last_type"))
      .localCheckpoint() // feeds three models + the anti-join
    val byType = cand.groupBy($"pid", $"ttype").agg(count(lit(1)).as("cnt"))
    val linear = byType.join(per, "pid")
      .select(lit("linear").as("model"), $"ttype".as("touch_type"),
        ($"cnt" * expr("cents div n") +
          when($"ttype" === $"last_type",
            $"cents" - $"n" * expr("cents div n")).otherwise(0L)).as("credit"))
    val firstM = per.select(lit("first").as("model"),
      $"first_type".as("touch_type"), $"cents".as("credit"))
    val lastM = per.select(lit("last").as("model"),
      $"last_type".as("touch_type"), $"cents".as("credit"))
    val direct = purch.join(per.select($"pid"), Seq("pid"), "left_anti")
    val directM = Seq("first", "last", "linear").map { m =>
      direct.select(lit(m).as("model"), lit("direct").as("touch_type"),
        $"cents".as("credit"))
    }.reduce(_ unionAll _)
    // (pid, touch_type) is unique within each model, so row count IS the
    // purchase count per cell — no countDistinct expand needed
    linear.unionAll(firstM).unionAll(lastM).unionAll(directM)
      .groupBy($"model", $"touch_type")
      .agg(sum($"credit").as("credited_cents"),
        count(lit(1)).as("n_purchases"))
  }

  /** DuckDB twin of [[attribution]] — same window join; first/last via
    * row_number over (ts, event_id) (≡ min_by/max_by on the unique
    * order), same exact-total linear split. */
  val attributionOracle: String =
    s"""WITH purch AS (SELECT event_id AS pid, user_id, ts AS pts,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |cand AS MATERIALIZED (SELECT p.pid, p.cents, t.event_id AS tid,
       |    t.ts AS tts, t.event_type AS ttype
       |  FROM purch p JOIN events t ON t.user_id = p.user_id
       |  WHERE t.event_type IN (${AttribTouchTypes.map("'" + _ + "'").mkString(", ")})
       |    AND t.ts < p.pts AND t.ts >= p.pts - INTERVAL $AttribWindowDays DAY),
       |rk AS (SELECT pid, cents, ttype,
       |    row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS rf,
       |    row_number() OVER (PARTITION BY pid ORDER BY tts DESC, tid DESC) AS rl
       |  FROM cand),
       |per AS MATERIALIZED (SELECT pid,
       |    CAST(count(*) AS BIGINT) AS n, min(cents) AS cents,
       |    min(CASE WHEN rf = 1 THEN ttype END) AS first_type,
       |    min(CASE WHEN rl = 1 THEN ttype END) AS last_type
       |  FROM rk GROUP BY pid),
       |bytype AS (SELECT pid, ttype, CAST(count(*) AS BIGINT) AS cnt
       |  FROM cand GROUP BY pid, ttype),
       |linear AS (SELECT 'linear' AS model, b.ttype AS touch_type,
       |    b.cnt * (p.cents // p.n) + CASE WHEN b.ttype = p.last_type
       |      THEN p.cents - p.n * (p.cents // p.n) ELSE 0 END AS credit
       |  FROM bytype b JOIN per p USING (pid)),
       |firsts AS (SELECT 'first', first_type, cents FROM per),
       |lasts AS (SELECT 'last', last_type, cents FROM per),
       |direct AS (SELECT p.pid, p.cents FROM purch p
       |  WHERE p.pid NOT IN (SELECT pid FROM per)),
       |directm AS (SELECT m.model, 'direct' AS touch_type, d.cents AS credit
       |  FROM direct d, (SELECT unnest(['first', 'last', 'linear']) AS model) m),
       |credits AS (SELECT * FROM linear UNION ALL SELECT * FROM firsts
       |  UNION ALL SELECT * FROM lasts UNION ALL SELECT * FROM directm)
       |SELECT model, touch_type, CAST(sum(credit) AS BIGINT) AS credited_cents,
       |  CAST(count(*) AS BIGINT) AS n_purchases
       |FROM credits GROUP BY model, touch_type""".stripMargin

  // ---------------------------------------------- robust (MAD) anomaly twin
  /** MAD threshold ×10⁴: 3 · 1.4826 (the normal-consistency constant)
    * = 4.4478 → 44478. */
  val MadK4 = 44478L

  /** Median/MAD anomaly windows — the ROBUST twin of the 3σ
    * [[anomalyWindows]]: mean/variance move with the outliers they are
    * supposed to find (one huge window inflates σ and masks the rest —
    * the classic masking failure); median and MAD have a 50 %
    * breakdown point, so a burst cannot hide itself. Production runs
    * both: σ for well-behaved streams, MAD when bursts are the point.
    *
    * Exactness: hourly counts are integers; the median of integers
    * lives on the ½-grid and the MAD on the ¼-grid, so `2·median` and
    * `4·MAD` are EXACT integers ([[graft.operators.Profiling.rfmSegments]]'
    * percentile ↔ quantile_cont parity, then one exact round). The flag
    * `|c − med| > 4.4478·MAD` becomes the all-integer comparison
    * `|4c − 2·m2| · 10⁴ > `[[MadK4]]`· mad4` — no float anywhere in the
    * decision. Degenerate MAD = 0 (constant counts) flags every
    * off-median window — MAD's documented behavior, not a bug.
    *
    * Scale shape: two bounded per-type aggregates (median, then MAD of
    * the residuals) riding broadcast joins back onto the window-count
    * frame — the [[anomalyWindows]] plan with one extra pass. */
  def madAnomalyWindows(s: SparkSession, d: String): DataFrame =
    madAnomalyWindowsOf(Tables.events(s, d))

  private[graft] def madAnomalyWindowsOf(ev0: DataFrame): DataFrame = {
    val s = ev0.sparkSession
    import s.implicits._
    val wc = ev0
      .groupBy($"event_type", date_trunc("hour", $"ts").as("window_start"))
      .agg(count(lit(1)).as("c"))
    val med = wc.groupBy($"event_type")
      .agg(expr("CAST(round(2 * percentile(c, 0.5D)) AS BIGINT)").as("m2"))
    val mad = wc.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(expr("CAST(round(4 * percentile(abs(c - m2 / 2.0D), 0.5D)) AS BIGINT)")
        .as("mad4"), min($"m2").as("m2"))
    wc.join(broadcast(mad), "event_type")
      .filter(expr(s"abs(4 * c - 2 * m2) * 10000 > $MadK4 * mad4"))
      .select($"event_type", $"window_start", $"c".as("n_events"),
        ($"m2" * 500L).as("median_milli"), ($"mad4" * 250L).as("mad_milli"))
  }

  /** DuckDB twin of [[madAnomalyWindows]] — quantile_cont mirrors
    * percentile's linear interpolation; identical integer decision. */
  val madAnomalyWindowsOracle: String =
    s"""WITH wc AS (SELECT event_type, date_trunc('hour', ts) AS window_start,
       |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
       |med AS (SELECT event_type,
       |    CAST(round(2 * quantile_cont(c, 0.5)) AS BIGINT) AS m2
       |  FROM wc GROUP BY event_type),
       |mad AS (SELECT wc.event_type,
       |    CAST(round(4 * quantile_cont(abs(wc.c - med.m2 / 2.0), 0.5)) AS BIGINT)
       |      AS mad4, min(med.m2) AS m2
       |  FROM wc JOIN med USING (event_type) GROUP BY wc.event_type)
       |SELECT wc.event_type, wc.window_start, wc.c AS n_events,
       |  CAST(m.m2 * 500 AS BIGINT) AS median_milli,
       |  CAST(m.mad4 * 250 AS BIGINT) AS mad_milli
       |FROM wc JOIN mad m USING (event_type)
       |WHERE abs(4 * wc.c - 2 * m.m2) * 10000 > $MadK4 * m.mad4""".stripMargin

  // ---------------------------------------------- watermark lateness advisor
  /** Out-of-orderness audit of the event stream — the measurement that
    * SIZES `withWatermark` before anyone deploys a streaming query: for
    * each event, how far behind the user's running-maximum timestamp
    * (in arrival order — event_id is the arrival proxy) did it arrive?
    * A watermark below the observed lateness tail silently DROPS those
    * events in every append-mode aggregation; a watermark far above it
    * holds state for nothing. The [[graft.streaming.EventStream]]
    * operators all take this number on faith today — this operator
    * measures it.
    *
    * Output: per (event_type, log₂ lateness-seconds bucket) counts with
    * inclusive bucket bounds (the [[Corpus.lengthHistogram]] integer
    * bit-length idiom; bucket −1 = in-order/first events) plus each
    * type's maximum observed lateness — read "the p100/p99 bucket per
    * type" directly off the rows.
    *
    * Scale shape: ONE user-keyed partitioned window (running max over
    * arrival order — O(1) state per row), then a map-side-combined
    * bounded aggregate. No global window, no driver traffic.
    *
    * On the driver corpus event_id order IS timestamp order, so every
    * row lands in bucket −1 — the advisor correctly reporting a
    * perfectly ordered stream (watermark 0 suffices). EventsSpec plants
    * out-of-order arrivals to pin the non-trivial buckets. */
  def latenessAdvisor(s: SparkSession, d: String): DataFrame =
    latenessAdvisorOf(Tables.events(s, d))

  private[graft] def latenessAdvisorOf(ev0: DataFrame): DataFrame = {
    val s = ev0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev0.select($"user_id", $"event_id", $"event_type",
        expr("unix_micros(ts)").as("us"))
      .withColumn("run_max", max($"us").over(w))
      .withColumn("late_s",
        greatest(lit(0L), expr("(coalesce(run_max, us) - us) div 1000000")))
      .withColumn("bucket",
        when($"late_s" === 0L, lit(-1))
          .otherwise(length(bin($"late_s")) - 1))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n_events"), max($"late_s").as("max_late_s"))
      .withColumn("lo_s", expr(
        "CASE WHEN bucket < 0 THEN 0 ELSE shiftleft(1L, bucket) END"))
      .withColumn("hi_s", expr(
        "CASE WHEN bucket < 0 THEN 0 ELSE shiftleft(1L, bucket + 1) - 1 END"))
      .orderBy($"event_type", $"bucket")
  }

  /** DuckDB twin of [[latenessAdvisor]] — same arrival-order running
    * max, integer-second lateness, bit-length buckets. */
  val latenessAdvisorOracle: String =
    """WITH l AS (SELECT event_type,
      |    greatest(0, (coalesce(max(epoch_us(ts)) OVER (
      |        PARTITION BY user_id ORDER BY event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      epoch_us(ts)) - epoch_us(ts)) // 1000000) AS late_s
      |  FROM events),
      |b AS (SELECT event_type, late_s,
      |    CASE WHEN late_s = 0 THEN -1
      |         ELSE CAST(length(bin(late_s)) AS INT) - 1 END AS bucket
      |  FROM l)
      |SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(max(late_s) AS BIGINT) AS max_late_s,
      |  CASE WHEN bucket < 0 THEN 0
      |       ELSE (CAST(1 AS BIGINT) << bucket) END AS lo_s,
      |  CASE WHEN bucket < 0 THEN 0
      |       ELSE (CAST(1 AS BIGINT) << (bucket + 1)) - 1 END AS hi_s
      |FROM b GROUP BY event_type, bucket
      |ORDER BY event_type, bucket""".stripMargin

  // ------------------------------------------------- cohort LTV curves
  /** Cohort lifetime-value curves: users cohorted by the WEEK of their
    * first signup event (Monday-start `date_trunc('week')`, identical in
    * both engines); for each (cohort_week, age_weeks) cell, the distinct
    * buyers, exact purchase cents, and the running cumulative — the LTV
    * curve finance reads next after [[retentionCohorts]]'s activity
    * matrix. Weekly (not monthly) granularity because the corpus clock
    * is what it is — the cells must actually tile the data's span.
    *
    * Week age is integer: both endpoints are week-start dates, so the
    * day difference is an exact multiple of 7 and `div 7` is exact.
    * Money is integer cents; the cumulative is a window over the BOUNDED
    * (cohort × age) cell frame — partitioned by cohort, so no
    * single-partition window however large the event volume.
    *
    * Scale shape: one groupBy-user signup aggregate, one user-keyed join
    * onto purchases (co-partitioned), one (cohort, age) cell aggregate
    * with a distinct-buyer count, then the window over ≤ |weeks|² cells. */
  def cohortLtv(s: SparkSession, d: String): DataFrame =
    cohortLtvOf(Tables.events(s, d))

  private[graft] def cohortLtvOf(ev0: DataFrame): DataFrame = {
    val s = ev0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sign = ev0.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("st"))
      .select($"user_id", to_date(date_trunc("week", $"st")).as("cw"))
    val pur = ev0.filter($"event_type" === "purchase")
      .select($"user_id", to_date(date_trunc("week", $"ts")).as("pw"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val cells = pur.join(sign, "user_id").filter($"pw" >= $"cw")
      .select($"cw".as("cohort_week"),
        expr("datediff(pw, cw) div 7").as("age_weeks"),
        $"cents", $"user_id")
      .groupBy($"cohort_week", $"age_weeks")
      .agg(countDistinct($"user_id").as("buyers"),
        sum($"cents").as("revenue_cents"))
    cells.withColumn("cum_revenue_cents",
      sum($"revenue_cents").over(Window.partitionBy($"cohort_week")
        .orderBy($"age_weeks")))
  }

  /** DuckDB twin of [[cohortLtv]] — same Monday-start weeks, integer
    * week ages, cents, and partitioned running sum. */
  val cohortLtvOracle: String =
    """WITH sign AS (SELECT user_id,
      |    CAST(date_trunc('week', min(ts)) AS DATE) AS cw
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |pur AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS pw,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |cells AS (SELECT s.cw AS cohort_week,
      |    CAST(date_diff('day', s.cw, p.pw) // 7 AS BIGINT) AS age_weeks,
      |    CAST(count(DISTINCT p.user_id) AS BIGINT) AS buyers,
      |    CAST(sum(p.cents) AS BIGINT) AS revenue_cents
      |  FROM pur p JOIN sign s USING (user_id) WHERE p.pw >= s.cw
      |  GROUP BY 1, 2)
      |SELECT cohort_week, age_weeks, buyers, revenue_cents,
      |  CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week
      |    ORDER BY age_weeks) AS BIGINT) AS cum_revenue_cents
      |FROM cells""".stripMargin
}
