package graft

/** The reference-compatible command shell, driven end-to-end:
  * put → maple → juice → get produces the sorted `key\tvalue` contract. */
class CliSpec extends SparkTestBase {

  private def withFreshWarehouse[T](body: => T): T =
    graft.testkit.TestWarehouse.withFresh(body)

  test("cli script: put, maple builtin:wc, juice builtin:wc, get") { withFreshWarehouse {
    val _ = spark // materialize shared session first so Cli reuses it
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli")
    val inFile = tmp.resolve("in.txt")
    java.nio.file.Files.writeString(inFile, "b a\na c a\n")
    val outFile = tmp.resolve("out.txt")
    val dirFile = tmp.resolve("dir.txt")
    val script = tmp.resolve("script.txt")
    java.nio.file.Files.writeString(script,
      s"""put $inFile in/f1
         |maple builtin:wc 4 wc1 in
         |juice builtin:wc 4 wc1 out 1
         |get out $outFile
         |get-dir in $dirFile
         |""".stripMargin)
    Cli.main(Array(s"@$script"))
    val out = java.nio.file.Files.readString(outFile)
    assert(out === "a\t3\nb\t1\nc\t1")
    // get-dir fetches every line under the prefix directory
    val dirLines = java.nio.file.Files.readString(dirFile).split("\n").toSet
    assert(dirLines === Set("b a", "a c a"))
  } }

  test("cli put: recent-update guard rejects on 'n' or missing answer, overwrites on 'y'") { withFreshWarehouse {
    val _ = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli_guard")
    val v1 = tmp.resolve("v1.txt"); java.nio.file.Files.writeString(v1, "first\n")
    val v2 = tmp.resolve("v2.txt"); java.nio.file.Files.writeString(v2, "second\n")
    val v3 = tmp.resolve("v3.txt"); java.nio.file.Files.writeString(v3, "third\n")
    val outFile = tmp.resolve("out.txt")
    val script = tmp.resolve("script.txt")
    // 2nd put answers n (rejected), 3rd answers y (accepted); the final
    // content must be v3's. End-of-input (no answer line) also rejects —
    // same default as the reference's 30 s prompt timeout.
    java.nio.file.Files.writeString(script,
      s"""put $v1 conf/f
         |put $v2 conf/f
         |n
         |put $v3 conf/f
         |y
         |get conf/f $outFile
         |""".stripMargin)
    Cli.main(Array(s"@$script"))
    assert(java.nio.file.Files.readString(outFile) === "third")
  } }

  test("cli put guard: a non-answer line rejects the put but still runs as a command") { withFreshWarehouse {
    val _ = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli_guard2")
    val v1 = tmp.resolve("v1.txt"); java.nio.file.Files.writeString(v1, "first\n")
    val v2 = tmp.resolve("v2.txt"); java.nio.file.Files.writeString(v2, "second\n")
    val outFile = tmp.resolve("out.txt")
    val script = tmp.resolve("script.txt")
    // a script unaware of the prompt: the `get` after the guarded put is
    // NOT consumed as the answer — the put is rejected (default no) and
    // the get must still execute, fetching the original content
    java.nio.file.Files.writeString(script,
      s"""put $v1 conf/f
         |put $v2 conf/f
         |get conf/f $outFile
         |""".stripMargin)
    Cli.main(Array(s"@$script"))
    assert(java.nio.file.Files.readString(outFile) === "first")
  } }

  test("cli word-count-1m loader: stages 26 files and runs wc end-to-end") { withFreshWarehouse {
    val _ = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_wc1m")
    val outFile = tmp.resolve("wc1m-out.txt")
    val script = tmp.resolve("script.txt")
    java.nio.file.Files.writeString(script,
      s"""word-count-1m
         |maple builtin:wc 4 wc1m mj~wc~1m
         |juice builtin:wc 4 wc1m wc1m-out 0
         |get wc1m-out $outFile
         |""".stripMargin)
    Cli.main(Array(s"@$script"))
    val lines = java.nio.file.Files.readString(outFile).split("\n")
    // every line is word\tcount; counts sum to 12 words/line × total lines
    val counts = lines.map { l =>
      val Array(w, c) = l.split("\t"); (w, c.toLong)
    }
    assert(counts.nonEmpty && counts.forall(_._2 > 0))
    val totalWords = counts.map(_._2).sum
    // 26 files × (1 MiB / 72 B, floored PER FILE) lines × 12 words
    assert(totalWords === 26L * ((1L << 20) / 72) * 12)
    // output sorted by key — the D9 contract
    assert(lines.map(_.split("\t")(0)).toSeq === lines.map(_.split("\t")(0)).sorted.toSeq)
  } }

  test("cli demo-wc: canned upload + wc job end-to-end matches the wc oracle") { withFreshWarehouse {
    val _ = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo")
    val in = tmp.resolve("wc-input")
    java.nio.file.Files.createDirectories(in)
    // two input files, reference generate-wc.py style (words per line)
    java.nio.file.Files.writeString(in.resolve("wc1.txt"), "dog cat dog\nbird\n")
    java.nio.file.Files.writeString(in.resolve("wc2.txt"), "cat dog\n")
    val outFile = tmp.resolve("demo-out.txt")
    val script = tmp.resolve("script.txt")
    java.nio.file.Files.writeString(script,
      s"""demo-wc $in
         |get output.txt $outFile
         |""".stripMargin)
    Cli.main(Array(s"@$script"))
    assert(java.nio.file.Files.readString(outFile) ===
      "bird\t1\ncat\t2\ndog\t3")
  } }
}
