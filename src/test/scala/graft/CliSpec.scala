package graft

/** The reference-compatible command shell, driven end-to-end:
  * put → maple → juice → get produces the sorted `key\tvalue` contract. */
class CliSpec extends SparkTestBase {

  test("cli script: put, maple builtin:wc, juice builtin:wc, get") {
    val _ = spark // materialize shared session first so Cli reuses it
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli")
    val wh = tmp.resolve("wh").toString
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
    // runs against the default warehouse (target/graft-warehouse);
    // put/juice overwrite, so reruns are safe
    Cli.main(Array(s"@$script"))
    val out = java.nio.file.Files.readString(outFile)
    assert(out === "a\t3\nb\t1\nc\t1")
    // get-dir fetches every line under the prefix directory
    val dirLines = java.nio.file.Files.readString(dirFile).split("\n").toSet
    assert(dirLines === Set("b a", "a c a"))
  }

  test("cli demo-wc: canned upload + wc job end-to-end matches the wc oracle") {
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
  }
}
