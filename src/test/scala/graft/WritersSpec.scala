package graft

import graft.sources.Writers

class WritersSpec extends SparkTestBase {
  import spark.implicits._

  test("sorted clustered output: part files cover disjoint, ordered key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_writer").toString + "/out"
    val o = graft.core.Tables.orders(spark, sf)
    Writers.writeSortedClustered(o, Seq("o_orderkey"), dir, numPartitions = 4)

    // global content preserved
    val back = spark.read.parquet(dir)
    assert(back.count() === o.count())

    // each part file's key range must be disjoint from every other's —
    // that is what makes parquet footer min/max prune whole files
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(parts.length >= 2)
    val ranges = parts.map { p =>
      val r = spark.read.parquet(p)
        .agg(org.apache.spark.sql.functions.min($"o_orderkey"),
          org.apache.spark.sql.functions.max($"o_orderkey"))
        .as[(Long, Long)].collect().head
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, maxA), (minB, _)) =>
        assert(maxA < minB, s"overlapping file ranges: ${ranges.mkString(", ")}")
      case _ =>
    }
    // and within a file, rows are sorted
    val first = spark.read.parquet(parts.head)
      .select($"o_orderkey").as[Long].collect()
    assert(first.toSeq === first.sorted.toSeq)
  }

  test("z-order: interleave exact vs JVM replay; windows of the curve stay spatially local") {
    import graft.sources.Writers
    // hand-pinned interleave: a=0b11 → bits 0,2; b=0b01 → bit 1 ⇒ 0b111=7
    assert(Writers.zValue(3L, 1L) === 7L)
    assert(Writers.zValue(0L, 3L) === 10L) // b bits land at 1 and 3
    val rows = Writers.zorderIndex(spark, sf)
      .selectExpr("cb", "db", "z")
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (c, d, z) => assert(z === Writers.zValue(c, d)) }
    assert(rows.forall { case (c, d, _) =>
      c >= 0 && c < (1 << Writers.ZBits) && d >= 0 && d < (1 << Writers.ZBits)
    })
    // locality: consecutive windows of the z-sorted curve keep BOTH
    // per-dimension spreads to a fraction of their domains — the
    // property that lets one physical sort order prune range scans on
    // either column. A single-column sort cannot: its windows pin one
    // dimension and span the ENTIRE other domain.
    def medianSpreads(ws: Iterator[Array[(Long, Long, Long)]]): (Double, Double) = {
      val s = ws.map(w => ((w.map(_._1).max - w.map(_._1).min).toDouble,
        (w.map(_._2).max - w.map(_._2).min).toDouble)).toSeq
      (s.map(_._1).sorted.apply(s.size / 2), s.map(_._2).sorted.apply(s.size / 2))
    }
    val cDom = (rows.map(_._1).max - rows.map(_._1).min).toDouble
    val dDom = (rows.map(_._2).max - rows.map(_._2).min).toDouble
    val (zc, zd) = medianSpreads(
      rows.sortBy(_._3).grouped(64).filter(_.length == 64))
    val (_, lc) = medianSpreads(
      rows.sortBy(r => (r._1, r._2)).grouped(64).filter(_.length == 64))
    info(f"z-windows: cust spread $zc%.0f/$cDom%.0f, day spread $zd%.0f/$dDom%.0f; " +
      f"custkey-sorted windows: day spread $lc%.0f/$dDom%.0f")
    assert(zc < cDom / 2 && zd < dDom / 2) // z bounds BOTH dimensions
    assert(lc > dDom * 0.9)                // linear sort pays full range on dim 2
  }

  test("compaction plan: hand-built manifest — next-fit groups, singleton demotion") {
    // source X fragments (batch → bytes): 0→1000, 1→1000, 2→1800(healthy),
    // 3→1400, 4→900. floor 1500 / target 4000:
    //   small scan [1000, 1000, 1400, 900]: grp1 = 1000+1000+1400 = 3400,
    //   +900 would hit 4300 > 4000 → grp2 = {900} → SINGLETON → demoted to
    //   keep (rewriting one small file alone buys nothing)
    val docs = Seq(
      (0L, "X", 1000L), (100L, "X", 1000L), (200L, "X", 1800L),
      (300L, "X", 1400L), (400L, "X", 900L)
    ).toDF("doc_id", "source", "n_chars")
    val frags = docs.groupBy($"source",
        org.apache.spark.sql.functions.expr(
          s"doc_id div ${Writers.FragBatchDocs}").as("batch"))
      .agg(org.apache.spark.sql.functions.sum($"n_chars").as("bytes"))
    val got = Writers.compactionPlanOf(frags)
      .as[(String, Long, Long, String, Long)].collect().sortBy(_._2).toSeq
    assert(got === Seq(
      ("X", 0L, 1000L, "rewrite", 1L),
      ("X", 1L, 1000L, "rewrite", 1L),
      ("X", 2L, 1800L, "keep", 0L),
      ("X", 3L, 1400L, "rewrite", 1L),
      ("X", 4L, 900L, "keep", 0L)))
  }

  test("compaction plan on the sf corpus: assignment exactly once, fill <= target, no singleton rewrites") {
    val frags = graft.core.Tables.documents(spark, sf)
      .groupBy($"source",
        org.apache.spark.sql.functions.expr(
          s"doc_id div ${Writers.FragBatchDocs}").as("batch"))
      .agg(org.apache.spark.sql.functions.sum($"n_chars").as("bytes"))
    val manifest = frags.as[(String, Long, Long)].collect()
    val plan = Writers.compactionPlanOf(frags)
      .as[(String, Long, Long, String, Long)].collect()
    // every fragment planned exactly once, bytes preserved
    assert(plan.map(r => (r._1, r._2) -> r._3).toMap ===
      manifest.map(r => (r._1, r._2) -> r._3).toMap)
    assert(plan.length === manifest.length)
    // both actions actually occur at this floor (the thresholds split the
    // population — a one-sided plan would test nothing)
    assert(plan.exists(_._4 == "keep") && plan.exists(_._4 == "rewrite"))
    // healthy fragments are never rewritten; keeps carry group 0
    plan.foreach { case (_, _, bytes, action, grp) =>
      if (bytes >= Writers.FragFloorBytes) assert(action == "keep")
      assert((action == "keep") == (grp == 0L))
    }
    // rewrite groups: fill <= target, >= 2 members, same-source members
    plan.filter(_._4 == "rewrite").groupBy(r => (r._1, r._5)).foreach {
      case (_, members) =>
        assert(members.length >= 2, "singleton rewrite group survived")
        assert(members.map(_._3).sum <= Writers.FragTargetBytes)
    }
  }

  test("JSONL round-trip is lossless on escaping, unicode, and types") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain text", "en", "src0", 10L),
      (2L, "quotes \" and \\ backslash", "en", "src0", 24L),
      (3L, "tab\there newline-free but control  char", "en", "src1", 40L),
      (4L, "unicode: 中文 émojis 😀 ḟancy", "zh", "src1", 25L),
      (5L, "{\"looks\": \"like json\"}", "en", "src2", 22L),
      (6L, "", "en", "src2", 0L), // empty text must survive, not become null
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val path = s"target/jsonl_rt_spec/${java.lang.Long.toHexString(System.nanoTime())}"
    val back = graft.sources.Writers.jsonlRoundtripOf(nasty, path)
      .as[(Long, String, String, String, Long)].collect().toSet
    val want = nasty.as[(Long, String, String, String, Long)].collect().toSet
    assert(back === want)
  }

  test("layout skipping report: totals agree, pruning dominance, micros arithmetic") {
    val rows = graft.sources.Writers.layoutSkippingReport(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 6)
    val total = rows.head._6
    rows.foreach { case (layout, pred, nb, bs, rs, rt, micros) =>
      assert(rt === total, s"$layout/$pred rows_total")
      assert(nb <= graft.sources.Writers.SkipBuckets)
      assert(bs <= nb && rs <= rt)
      assert(micros === rs * 1000000L / rt, s"$layout/$pred micros")
    }
    val scan = rows.map { case (l, p, _, _, rs, _, _) => (l, p) -> rs }.toMap
    // the single-column sort serves its own predicate and abandons the other
    assert(scan(("custkey_sorted", "custkey_range")) < total / 4)
    assert(scan(("custkey_sorted", "date_range")) === total)
    // z-order prunes meaningfully on BOTH dimensions — the reason it exists
    assert(scan(("zorder", "custkey_range")) < total / 2)
    assert(scan(("zorder", "date_range")) < total / 2)
    // and never scans more than the unclustered layout
    Seq("custkey_range", "date_range").foreach { p =>
      assert(scan(("zorder", p)) <= scan(("natural", p)), p)
    }
  }

  test("csv roundtrip survives delimiters, quotes, and escapes in field values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/rt"
    val hostile = Seq(
      (1L, "a", """{"k": 1, "s": "x,y"}"""),   // delimiter inside JSON
      (2L, "b", """say "hi", ok"""),           // bare quotes + comma
      (3L, "c", ""),                           // empty field
      (4L, "d", """back\slash and, comma"""),  // escape char in data
      (5L, "e", null),                         // true NULL, distinct from ""
    ).toDF("event_id", "event_type", "props")
    val back = graft.sources.Writers.csvRoundtripOf(hostile, dir)
      .as[(Long, String, String)].collect().toSet
    // empty string AND null each round-trip as THEMSELVES — the
    // nullValue-sentinel/emptyValue options resolve CSV's classic
    // empty-vs-null ambiguity (the r10-advice latent props_md5 NULL)
    val want = hostile.as[(Long, String, String)].collect().toSet
    assert(back === want)
    // corpus leg: the digest frame equals the same digests off parquet
    val got = graft.sources.Writers.csvRoundtrip(spark, sf)
      .as[(Long, String, String, Long)].collect().toSet
    val direct = graft.core.Tables.events(spark, sf)
      .selectExpr("event_id", "event_type", "md5(props)",
        "CAST(round(value * 100) AS BIGINT)")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got === direct)
  }
}
