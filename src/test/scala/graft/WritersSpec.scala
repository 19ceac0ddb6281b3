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
}
