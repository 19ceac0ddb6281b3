package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkTestBase {

  test("approx profile: same schema, exact counts/min/max, NDV within HLL++ error") {
    val exact = Profiling.profileLineitem(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    val approxDf = Profiling.profileLineitemApprox(spark, sf)
    assert(approxDf.columns.toSeq ===
      Seq("column_name", "n_nonnull", "n_distinct", "min_value", "max_value"))
    val approx = approxDf.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, (nn, nd, mn, mx)) =>
      val (ann, and, amn, amx) = approx(c)
      // count/min/max are exact aggregates in both forms
      assert(ann === nn, s"$c n_nonnull")
      assert(amn === mn && amx === mx, s"$c min/max")
      // HLL++ at rsd 0.02 — allow 5% relative (2.5 sigma) plus slack on
      // tiny NDVs (small cardinalities use HLL++'s near-exact sparse mode)
      assert(math.abs(and - nd) <= math.max(2L, (nd * 0.05).toLong),
        s"$c approx NDV $and vs exact $nd")
    }
  }

  test("integrity audit: clean corpus reports zeros; planted violations count exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val clean = Profiling.auditIntegrity(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean("docs_total") === 500)
    Seq("docs_empty_text", "docs_dup_id", "docs_missing_embedding",
      "embeddings_orphan", "embeddings_null_vec", "embeddings_ragged_dim",
      "orders_orphan_custkey", "lineitem_orphan_orderkey")
      .foreach(k => assert(clean(k) === 0L, k))

    // plant one violation of each doc/embedding class and count them back
    val docs = graft.core.Tables.documents(spark, sf)
    val emb = graft.core.Tables.embeddings(spark, sf)
    val docsBad = docs
      .unionAll(docs.limit(2).withColumn("text", lit("")))       // 2 dup ids, also empty text
      .unionAll(docs.limit(1).withColumn("doc_id", lit(900001L))) // no embedding
    val embBad = emb
      .unionAll(emb.limit(1).withColumn("vec_id", lit(900002L))) // orphan
      .unionAll(emb.limit(1).withColumn("vec_id", lit(900003L))
        .withColumn("embedding", slice($"embedding", 1, 3)))     // orphan + ragged
      .unionAll(emb.limit(1).withColumn("vec_id", lit(900004L))
        .withColumn("embedding", lit(null).cast("array<float>"))) // orphan + null
    val out = Profiling.auditIntegrityOf(docsBad, embBad,
        graft.core.Tables.orders(spark, sf), graft.core.Tables.customer(spark, sf),
        graft.core.Tables.lineitem(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("docs_total") === 503)
    assert(out("docs_empty_text") === 2)
    assert(out("docs_dup_id") === 2)
    assert(out("docs_missing_embedding") === 1) // planted 900001 only
    assert(out("embeddings_orphan") === 3)
    assert(out("embeddings_null_vec") === 1)
    assert(out("embeddings_ragged_dim") === 1)
  }

  test("scd2 history: change capture, validity chaining, single current version") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: String): Timestamp = Timestamp.valueOf(d + " 00:00:00")
    val orders = Seq(
      // cust 1: P1, P1 (no change), P2, back to P1 — three versions
      (1L, 10L, ts("2020-01-01"), "P1"),
      (1L, 11L, ts("2020-02-01"), "P1"),
      (1L, 12L, ts("2020-03-01"), "P2"),
      (1L, 13L, ts("2020-04-01"), "P1"),
      // cust 2: a single order — one open-ended version
      (2L, 20L, ts("2021-06-15"), "P3"),
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val got = graft.operators.Profiling.scd2HistoryOf(orders)
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.size === 4)
    assert(got((1L, 1)) === ((1L, 1, "P1", ts("2020-01-01"),
      Some(ts("2020-03-01")), false)))
    assert(got((1L, 2)) === ((1L, 2, "P2", ts("2020-03-01"),
      Some(ts("2020-04-01")), false)))
    assert(got((1L, 3)) === ((1L, 3, "P1", ts("2020-04-01"),
      None, true)))
    assert(got((2L, 1)) === ((2L, 1, "P3", ts("2021-06-15"),
      None, true)))
  }

  test("scd2 skew-resistant form equals the plain window form exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: String): Timestamp = Timestamp.valueOf(d + " 00:00:00")
    // bucket-boundary torture feed: no-change boundary (Jan→Feb), change
    // AT a bucket's first row (Mar), an EMPTY month gap (Apr), same-month
    // multi-change (May), and a single-order customer
    val orders = Seq(
      (1L, 10L, ts("2020-01-05"), "P1"),
      (1L, 11L, ts("2020-02-10"), "P1"),
      (1L, 12L, ts("2020-03-01"), "P2"),
      (1L, 13L, ts("2020-03-20"), "P2"),
      (1L, 14L, ts("2020-05-02"), "P1"),
      (1L, 15L, ts("2020-05-03"), "P3"),
      (2L, 20L, ts("2021-06-15"), "P3"),
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val plain = graft.operators.Profiling.scd2HistoryOf(orders)
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)].collect().toSet
    val skewres = graft.operators.Profiling.scd2SkewResistantOf(orders)
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)].collect().toSet
    assert(skewres === plain)
    assert(plain.size === 5) // cust 1: P1,P2,P1,P3; cust 2: P3
    // and on the full corpus: row-for-row identical
    val p2 = graft.operators.Profiling.scd2History(spark, sf)
      .as[(Long, Int, String, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)].collect().toSet
    val s2 = graft.operators.Profiling.scd2HistorySkewResistant(spark, sf)
      .as[(Long, Int, String, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)].collect().toSet
    assert(s2 === p2)
  }

  test("scd2 history on the sf corpus: contiguous versions, chained intervals, one current") {
    import spark.implicits._
    val rows = graft.operators.Profiling.scd2History(spark, sf)
      .as[(Long, Int, String, java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)]
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length), s"cust $cust versions")
      assert(sorted.count(_._6) === 1, s"cust $cust must hold exactly one current row")
      assert(sorted.last._6 && sorted.last._5.isEmpty, s"cust $cust tail open")
      // interval chaining: valid_to of version k = valid_from of k+1;
      // consecutive versions always differ in the tracked attribute
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"cust $cust chain")
          assert(a._3 !== b._3, s"cust $cust consecutive versions must differ")
        case _ =>
      }
    }
  }

  test("snapshot diff: statuses exactly match the synthesis rules, unchanged filtered out") {
    import spark.implicits._
    val out = Profiling.snapshotDiff(spark, sf)
      .as[(Long, String)].collect().toMap
    val ids = graft.core.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect()
    val expected = ids.flatMap { id =>
      if (id % 10 == 9) Some(id -> "added")
      else if (id % 41 == 3) Some(id -> "removed")
      else if (id % 7 == 0) Some(id -> "changed")
      else None // unchanged: must be absent
    }.toMap
    assert(out === expected)
    assert(out.values.toSet === Set("added", "removed", "changed"))
  }

  test("hot keys: MG candidate set keeps every φ-heavy key while decrements fire") {
    // 400 distinct cold keys (one hit each) force constant decrements at
    // capacity 127; the planted key carries 30% of the stream and MUST
    // survive the sketch (undercount ≤ N/(cap+1) < its count).
    val cold = (1 to 400).map(i => ("k", s"cold_$i"))
    val hot = Seq.fill(172)(("k", "HOT"))
    // interleave so the hot mass isn't front-loaded
    val stream = (hot ++ cold).zipWithIndex.sortBy(_._2 % 7).map(_._1)
    val cands = Profiling.mgSketch(stream.iterator, Profiling.MgCapacity)
      .filter(_._2 != null).map(_._2).toSet
    assert(cands.contains("HOT"))
    assert(cands.size <= Profiling.MgCapacity)
    // summary row carries the exact partition count
    val n = Profiling.mgSketch(stream.iterator, Profiling.MgCapacity)
      .collectFirst { case ("k", null, c) => c }.get
    assert(n === 572L)
  }

  test("hot keys: output is exact and partition-invariant; uniform column is empty") {
    import spark.implicits._
    // skewed column: one key at ~33%, 200 cold keys; uniform column: 300
    // keys, one row each (no key can reach 1/125 of the mass)
    // null keys are excluded BY CONTRACT (the ADVICE null-marker fix):
    // they must neither appear as hot keys nor inflate the column's N —
    // with them counted, HOT's share would be 100/450 and the ×10⁶ share
    // below would change
    val rows =
      Seq.fill(100)(("skewed", "HOT")) ++
        (1 to 200).map(i => ("skewed", s"c$i")) ++
        Seq.fill(150)(("skewed", null: String)) ++
        (1 to 300).map(i => ("uniform", s"u$i"))
    def run(parts: Int) =
      Profiling.hotKeysOf(rows.toDF("key_col", "key").repartition(parts))
        .as[(String, String, Long, Long)].collect().toSeq
    val one = run(1)
    assert(one === Seq(("skewed", "HOT", 100L, 333333L)))
    // candidate sets differ across partitionings; the verified output may not
    assert(run(7) === one && run(32) === one)
  }

  test("incremental agg: delta algebra equals recompute; emptied groups vanish") {
    import spark.implicits._
    // hand frame (k, custkey, cents): customer 1 keeps base rows, customer 2's
    // only base row is deleted (k=44 ≡ 3 mod 41 — group must vanish), customer
    // 3 arrives only via the insert leg (k=9), k=70 gets the +1000.00 update
    val o = Seq(
      (1L, 1L, 500L), (70L, 1L, 1000L), (44L, 2L, 700L), (9L, 3L, 900L))
      .toDF("k", "custkey", "cents")
    val got = Profiling.incrementalAggOf(o)
      .as[(Long, Long, Long)].collect().toSeq
    // new snapshot: cust1 = {500, 1000+100000}, cust2 = {}, cust3 = {900}
    assert(got === Seq((1L, 2L, 101500L), (3L, 1L, 900L)))
  }

  test("RFM: scores in 1..4, quartiles balanced, extremes score 4") {
    import spark.implicits._
    val rows = Profiling.rfmSegments(spark, sf)
      .as[(Long, Long, Long, Long, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, _, _, _, r, f, m) =>
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4, s"cust $c")
    }
    // quartile cuts: each m-score class holds 10-40% of customers (exact
    // quarters up to ties on the cut values)
    val n = rows.length.toDouble
    (1 to 4).foreach { sc =>
      val frac = rows.count(_._7 == sc) / n
      assert(frac > 0.10 && frac < 0.40, s"m_score $sc holds $frac")
    }
    // the biggest spender and the most recent customer sit in the top bucket
    assert(rows.maxBy(_._4)._7 === 4)
    assert(rows.minBy(_._2)._5 === 4)
    // recency inverts: the stalest customer scores 1
    assert(rows.maxBy(_._2)._5 === 1)
  }

  test("abc pareto: before-share classes, top customer always A, per-nation isolation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // nation 1: revenues 80/15/5 → textbook A/B/C; nation 2: 99/1 — the
    // dominant customer is A (before-share 0), the 1%er lands in C
    val orders = Seq(
      (1L, 80.0), (2L, 15.0), (3L, 5.0),
      (10L, 99.0), (11L, 1.0),
    ).map { case (k, v) => (k, v) }
      .toDF("o_custkey", "o_totalprice")
    val cust = Seq((1L, 1), (2L, 1), (3L, 1), (10L, 2), (11L, 2))
      .toDF("c_custkey", "c_nationkey")
    val dir = java.nio.file.Files.createTempDirectory("graft_abc").toString
    orders.write.parquet(s"$dir/orders.parquet")
    cust.withColumn("c_name", expr("CAST(c_custkey AS STRING)"))
      .withColumn("c_acctbal", expr("0.0d"))
      .withColumn("c_mktsegment", expr("'X'"))
      .write.parquet(s"$dir/customer.parquet")
    val got = graft.operators.Profiling.abcPareto(spark, dir)
      .as[(Long, Int, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 1, 8000L, 8000L, 0L, "A")))
    assert(got(2L) === ((2L, 1, 1500L, 9500L, 800000L, "B")))
    assert(got(3L) === ((3L, 1, 500L, 10000L, 950000L, "C")))
    assert(got(10L) === ((10L, 2, 9900L, 9900L, 0L, "A")))
    assert(got(11L) === ((11L, 2, 100L, 10000L, 990000L, "C")))
  }

  test("entropy: exact micro-bits for uniform, constant, and skewed columns") {
    import spark.implicits._
    def h(vals: Seq[String]): (Long, Long, Long, Long) = {
      val r = graft.operators.Profiling
        .entropyOfCol("t.c", vals.toDF("v"))
        .as[(String, Long, Long, Long, Long)].collect().head
      (r._2, r._3, r._4, r._5)
    }
    // uniform over 4 values: H = max = exactly 2 bits
    assert(h(Seq("a", "b", "c", "d")) === ((4L, 4L, 2000000L, 2000000L)))
    // constant column: 0 bits (max 0 too: log2(1) = 0)
    assert(h(Seq("a", "a", "a")) === ((1L, 3L, 0L, 0L)))
    // 3:1 split: terms snap to 311278 + 500000 micro-bits
    assert(h(Seq("a", "a", "a", "b")) === ((2L, 4L, 811278L, 1000000L)))
    // nulls are excluded from the distribution by contract
    assert(h(Seq("a", null, "a", null, "b", "b")) ===
      ((2L, 4L, 1000000L, 1000000L)))
    // fully-NULL column: the contract degenerate row (0, 0, NULL, NULL)
    // — not zero rows (the r10-advice latent row-count mismatch)
    val degen = graft.operators.Profiling
      .entropyOfCol("t.c", Seq[String](null, null).toDF("v"))
      .as[(String, Long, Long, Option[Long], Option[Long])].collect()
    assert(degen === Array(("t.c", 0L, 0L, None, None)))
  }

  test("entropy: per-table melt matches the per-column path") {
    import spark.implicits._
    // two columns of one table through the table-melt path must equal
    // the two single-column runs (the r11 one-scan-per-table rewrite)
    val df = Seq(("a", "x"), ("b", "x"), ("a", "y"), ("a", "x"))
      .toDF("c1", "c2")
    val melted = df.selectExpr(
      "stack(2, 't.c1', c1, 't.c2', c2) AS (table_col, v)")
    val got = graft.operators.Profiling
      .entropyMelted(Seq("t.c1", "t.c2"), melted)
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    val want = Seq("c1", "c2").map { c =>
      graft.operators.Profiling
        .entropyOfCol(s"t.$c", df.select(org.apache.spark.sql.functions.col(c).as("v")))
        .as[(String, Long, Long, Option[Long], Option[Long])].collect().head
    }.sortBy(_._1)
    assert(got.toSeq === want)
  }

  test("correlations: exact +1/-1 on linear columns, NULL on zero variance") {
    import spark.implicits._
    // price = 2*qty (r = +1), discount basis points = 10 − qty (r = −1),
    // tax constant (zero variance)
    val li = Seq(1.0, 2.0, 3.0, 4.0)
      .map(q => (q, 2.0 * q, (10.0 - q) / 10000.0, 0.05))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = graft.operators.Profiling.correlationsOf(li)
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("qty_c", "price_c")) === Some(1.0))
    assert(got(("qty_c", "disc_bp")) === Some(-1.0))
    // the constant tax column has zero variance → NULL, never NaN
    assert(got(("qty_c", "tax_bp"))   === None)
    assert(got(("price_c", "tax_bp")) === None)
    assert(got(("disc_bp", "tax_bp")) === None)
  }
}
