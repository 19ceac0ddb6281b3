package graft

import graft.engine.{JobRunner, KV, MapleJuice, PipeRunner}
import graft.sources.Sdfs
import graft.testkit.Generators

/** Golden end-to-end tests on the reference's workload shapes (FIXTURES.md
  * A1–A3): skewed word count and reverse web-link graph through the full
  * engine lifecycle, validated against in-memory recomputation. */
class GoldenSpec extends SparkTestBase {
  import spark.implicits._

  test("golden WC: 150k skewed draws through put -> maple -> juice -> sorted sink") {
    val lines = Generators.wcLines(seed = 7)
    val expected = lines.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }
    // skew sanity: hottest word well above the median (hot-key test)
    val counts = expected.values.toSeq.sorted
    assert(counts.last > counts(counts.size / 2) * 2)

    val wh = java.nio.file.Files.createTempDirectory("graft_golden").toString
    val sdfs = new Sdfs(spark, wh)
    sdfs.put(lines.toDS(), "wcin/part0")
    val runner = new JobRunner(spark, sdfs)
    runner.submit(runner.MapleJob(s"$wh/wcin",
      ls => ls.flatMap(_.split("\\s+")).filter(_.nonEmpty).map(w => KV(w, "1")),
      "wc_g"))
    runner.submit(runner.JuiceJob("wc_g",
      (k, vs) => Iterator.single(KV(k, vs.map(_.toLong).sum.toString)),
      s"$wh/wcout", deleteInput = true))

    val out = spark.read.textFile(s"$wh/wcout").collect().toSeq
    assert(out === out.sorted) // reference contract: sorted by key
    val got = out.map { l =>
      val Array(k, v) = l.split("\t"); (k, v.toLong)
    }.toMap
    assert(got === expected)
  }

  test("golden RWLG: 116k skewed edges match in-memory adjacency") {
    val edges = Generators.rwlgEdges(seed = 11, draws = 20000)
    val expected = edges.map { e =>
      val Array(s, t) = e.split(","); (t, s)
    }.groupBy(_._1).map { case (t, es) =>
      (t, es.map(_._2).distinct.sorted.mkString(","))
    }
    val mj = new MapleJuice(spark)
    val got = mj.runOn(edges.toDS(),
        ls => ls.flatMap { l =>
          val i = l.indexOf(',')
          if (i < 0) Iterator.empty
          else Iterator.single(KV(l.substring(i + 1), l.substring(0, i)))
        },
        (k, vs) => Iterator.single(KV(k, vs.toSet.toSeq.sorted.mkString(","))))
      .as[(String, String)].collect().toMap
    assert(got === expected)
    assert(got.keySet.size <= 100) // targets drawn from 100 fixed link ids
  }

  test("strict-CSV pipe compat truncates values at the second comma like the reference") {
    val pr = new PipeRunner(spark, strictCsv = true)
    val out = pr.mapleExe(Seq("k,v1,v2-is-lost").toDS(), Seq("cat")).collect()
    assert(out.toSeq === Seq(KV("k", "v1")))
    val prFull = new PipeRunner(spark)
    val full = prFull.mapleExe(Seq("k,v1,v2-kept").toDS(), Seq("cat")).collect()
    assert(full.toSeq === Seq(KV("k", "v1,v2-kept")))
  }
}
