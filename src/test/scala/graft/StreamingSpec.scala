package graft

import graft.streaming.EventStream
import graft.operators.Relational

/** Structured Streaming results must equal their batch twins. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming windowed counts equal batch q20") {
    val stream = EventStream.runWindowedCountsBatch(spark, sf)
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = Relational.q20EventWindows(spark, sf)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(stream === batch)
  }

  test("windowed counts flush to a FILE sink in append mode as the watermark passes") {
    import org.apache.spark.sql.functions._
    // the scale-path sink shape: Append mode + parquet file sink. Split
    // the corpus events into an early and a late file so the stream runs
    // two micro-batches — the watermark advances after the first, and the
    // trailing no-data batch finalizes every window the watermark passed.
    // Expected emission: exactly the windows with end <= max event time
    // minus the 2h delay; only the tail windows stay in state.
    val raw = graft.core.Tables.events(spark, sf)
      .select($"event_id", (unix_micros($"ts") * 1000).as("ts"), $"user_id",
        $"event_type", $"value", $"props")
    val splitNs = raw.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong
    val dir = java.nio.file.Files.createTempDirectory("graft_fsink_src")
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$dir/stage_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    writeOne(raw.filter($"ts" <= splitNs), "0_early")
    writeOne(raw.filter($"ts" > splitNs), "1_late")
    new java.io.File(s"$dir/0_early.parquet").setLastModified(1000000L)
    new java.io.File(s"$dir/1_late.parquet").setLastModified(2000000L)
    val src = spark.readStream.schema(EventStream.eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val emitted = EventStream
      .runAppendToFileSink(spark, EventStream.windowedCounts(src))
      .as[(Long, String, Long, Double)].collect().toSet
    val all = Relational.q20EventWindows(spark, sf)
      .as[(Long, String, Long, Double)].collect().toSet
    // final watermark (ms) = max event time - 2h; a window is final when
    // its end has been passed (assert against both boundary strictness
    // variants so an ulp at the edge can't flake the test)
    val maxMs = graft.core.Tables.events(spark, sf)
      .select(max(unix_micros($"ts") / 1000)).as[Double].collect().head.toLong
    val wmMs = maxMs - 2 * 3600 * 1000L
    val closedLe = all.filter { case (ws, _, _, _) => (ws + 3600) * 1000L <= wmMs }
    val closedLt = all.filter { case (ws, _, _, _) => (ws + 3600) * 1000L < wmMs }
    assert(emitted === closedLe || emitted === closedLt,
      s"emitted ${emitted.size} windows; expected ${closedLe.size} watermark-passed of ${all.size}")
    assert(emitted.nonEmpty && emitted.size < all.size)
  }

  test("streaming windowed top-k types: equals batch rank, exactly one top-k per sealed window") {
    import org.apache.spark.sql.functions._
    val out = EventStream.runTopKTypesBatch(spark, sf)
      .as[(Long, String, Long, Int)].collect()
    // batch twin: counts per (hour window, type), rank by (n desc, type)
    val batch = graft.core.Tables.events(spark, sf)
      .groupBy((unix_timestamp(date_trunc("hour", $"ts"))).as("window_start"),
        $"event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"window_start")
          .orderBy($"n".desc, $"event_type".asc)))
      .filter($"rank" <= EventStream.TopKTypesK)
      .select($"window_start", $"event_type", $"n", $"rank")
      .as[(Long, String, Long, Int)].collect().toSet
    assert(out.toSet === batch)
    // exactly-once per window: no (window, rank) appears twice (a window
    // re-opened after sealing would duplicate its emission)
    val dup = out.groupBy(r => (r._1, r._4)).filter(_._2.length > 1)
    assert(dup.isEmpty, s"duplicated window emissions: ${dup.keys}")
    // every sealed window emitted a full ranked prefix 1..k
    out.groupBy(_._1).foreach { case (w, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1 to rs.length), s"window $w")
    }
  }

  test("skew-resistant sessionize equals the hash-partitioned batch sessionizer on the gate corpus") {
    val a = EventStream.sessionizeSkewResistant(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = EventStream.sessionizeBatchEquivalent(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a === b)
  }

  test("skew-resistant sessionize: hot user split across range partitions, boundary gaps exact") {
    import java.sql.Timestamp
    // planted corpus: one hot user (85% of events) whose single long
    // session MUST cross range-partition boundaries, plus exact-boundary
    // gap cases (1800 s merges, 1801 s splits) and a single-event user
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Timestamp, Long, String, Double)]
    var id = 0L
    def add(user: Long, tSec: Long): Unit = {
      id += 1
      rows += ((id, new Timestamp(tSec * 1000), user, "click", (id % 7) / 4.0))
    }
    var t = 1000000L
    (1 to 400).foreach { _ => add(1L, t); t += 1700 }   // one 400-event session
    t += 1801                                            // strict split
    (1 to 50).foreach { _ => add(1L, t); t += 100 }      // second session
    (0 until 10).foreach { i => add(2L, 500000L + i * 3601) } // 10 singleton sessions
    (0 until 5).foreach { i => add(3L, 500000L + i * 1800) }  // exactly 1800: ONE session
    add(4L, 42L)                                         // single event
    val ev = rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value")
    // precondition: the hot user really spans >= 2 range partitions —
    // otherwise this test would not exercise the fragment merge
    val hotSpread = ev.repartitionByRange(8, $"user_id", $"ts", $"event_id")
      .select($"user_id").as[Long]
      .mapPartitions(it => Iterator(it.count(_ == 1L))).collect()
    assert(hotSpread.count(_ > 0) >= 2, s"hot user in ${hotSpread.toSeq} partitions")
    val got = EventStream.sessionizeSkewResistantOf(ev, numParts = Some(8))
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = EventStream.sessionizeBatchEquivalentOf(ev)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    // spot-check the planted semantics directly
    val byUser = got.groupBy(_._1)
    assert(byUser(1L).map(s => (s._2, s._3)) === Set((1L, 400L), (2L, 50L)))
    assert(byUser(2L).size === 10 && byUser(2L).forall(_._3 === 1L))
    assert(byUser(3L) .map(s => (s._2, s._3)) === Set((1L, 5L)))
    assert(byUser(4L) === Set((4L, 1L, 1L, (rows.last._1 % 7) / 4.0)))
  }

  test("streaming decontamination admission filter equals the batch bloom operator") {
    import graft.operators.Dedup
    val stream = EventStream.streamingDecontaminateBatch(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = Dedup.bloomContamination(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    // the probe is stateless and shared code, so equality is exact — the
    // stream admits/flags precisely the docs the batch operator would
    assert(stream === batch)
    assert(stream.nonEmpty, "gate corpus is known to contain contaminated docs")
  }

  test("stateful sessionize (flatMapGroupsWithState) closed sessions are a prefix of batch sessions") {
    // run the streaming sessionizer over the finite event set; the last
    // (open) session per user is retained in state, all closed ones emitted
    val events = graft.core.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStream.Event]
    val closed = EventStream.sessionize(events)
      .collect().map(s => (s.user_id, s.session_id, s.n_events, s.session_value)).toSet
    val batch = EventStream.sessionizeBatchEquivalent(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val batchSet = batch.toSet
    // closed ⊂ batch, and batch \ closed is exactly one (final) session per user
    assert(closed.subsetOf(batchSet),
      s"closed sessions disagree with batch: ${closed -- batchSet}")
    val remaining = batch.filterNot(closed.contains)
    val users = batch.map(_._1).distinct
    assert(remaining.length === users.length)
    val lastPerUser = batch.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
    assert(remaining.toSet === lastPerUser)
  }

  test("streaming exact dedup (dropDuplicates on a stream) keeps one row per key") {
    import org.apache.spark.sql.streaming.OutputMode
    val name = s"graft_stream_dedup_${System.nanoTime()}"
    val events = EventStream.readEvents(spark, sf)
    val q = events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .select($"user_id", $"event_type")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).as[(Long, String)].collect()
    val expected = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"event_type").distinct().as[(Long, String)].collect()
    assert(got.length === expected.length)
    assert(got.toSet === expected.toSet)
  }

  test("watermark drops late events in append-mode windowed aggregation") {
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    def writeBatch(file: String, rows: Seq[(Long, String, Double)]): Unit = {
      // ns-long ts to match the events schema (hour offsets from a base)
      val base = 1700000000L
      rows.map { case (hourOff, et, v) =>
        (hourOff, (base + hourOff * 3600) * 1000000000L, 1L, et, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/in/$file")
    }
    // batch 1: one event in window H0, one in H2 → watermark rises to H1
    writeBatch("b1", Seq((0L, "a", 1.0), (2L, "a", 1.0)))
    val name = s"graft_late_${System.nanoTime()}"
    val q = spark.readStream.schema(EventStream.eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"w.start").as("ws"), $"event_type", $"n")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE event for window H0 (watermark already at H1) and
      // a fresh H4 event that pushes the watermark to H3, closing H0-H2
      writeBatch("b2", Seq((0L, "a", 1.0), (4L, "a", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).as[(Long, String, Long)].collect()
      .map { case (ws, _, n) => ((ws - 1700000000L + 1800) / 3600, n) }.toMap
    // H0's count must be 1: the late copy was dropped, not merged
    assert(out.get(0L).contains(1L), s"windows emitted: $out")
    assert(out.get(2L).contains(1L), s"windows emitted: $out")
  }

  test("stream-static join: streaming events enriched with a static dimension") {
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.functions._
    // static dimension derived from the same data: each user's first event type
    val profile = graft.core.Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(min_by($"event_type", $"ts").as("first_type"))
    val name = s"graft_ss_join_${System.nanoTime()}"
    val q = EventStream.readEvents(spark, sf)
      .join(profile, "user_id") // stream-static equi-join (no watermark needed)
      .groupBy($"first_type")
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).as[(String, Long)].collect().toSet
    val batch = graft.core.Tables.events(spark, sf)
      .join(profile, "user_id")
      .groupBy($"first_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("batch sessionizer matches the SQL-window q21 result") {
    val a = EventStream.sessionizeBatchEquivalent(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = Relational.q21Sessionize(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a === b)
  }

  test("stream-stream interval join equals the batch interval join") {
    import org.apache.spark.sql.functions._
    val got = EventStream.runIntervalJoinBatch(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    val ev = graft.core.Tables.events(spark, sf)
    val v = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("v_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"event_id".as("click_id"), $"ts".as("c_ts"))
    val want = v.join(c, $"user_id" === $"cu" &&
        $"c_ts" >= $"v_ts" && $"c_ts" <= $"v_ts" + expr("INTERVAL 30 MINUTES"))
      .select($"user_id", $"view_id", $"click_id",
        (unix_micros($"c_ts") - unix_micros($"v_ts")).as("lag"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.forall(r => r._4 >= 0 && r._4 <= 30L * 60 * 1000000))
  }

  test("streaming funnel: sealed per-user rows equal the batch chained-min funnel") {
    import org.apache.spark.sql.functions._
    val got = EventStream.runFunnelUsersBatch(spark, sf)
      .selectExpr("user_id", "CAST(t1 AS STRING)", "CAST(t2 AS STRING)", "CAST(t3 AS STRING)")
      .as[(Long, String, Option[String], Option[String])].collect().toSet
    // batch twin, computed independently with DataFrame chained mins
    val ev = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts")
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val t2 = ev.filter($"event_type" === "click").join(t1, "user_id")
      .filter($"ts" >= $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
    val t3 = ev.filter($"event_type" === "purchase")
      .join(t2, "user_id").filter($"ts" >= $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    val want = t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .selectExpr("user_id", "CAST(t1 AS STRING)", "CAST(t2 AS STRING)", "CAST(t3 AS STRING)")
      .as[(Long, String, Option[String], Option[String])].collect().toSet
    assert(got.size === want.size)
    assert(got === want)
    // sanity: rows exist and at least some funnels completed (at the
    // tiny test SF every viewer happens to convert — the null pattern is
    // pinned by the set equality above, not assumed here)
    assert(got.nonEmpty && got.exists(_._4.nonEmpty))
  }
}
