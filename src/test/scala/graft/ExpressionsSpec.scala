package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions
import graft.functions.Hashing

/** Native Catalyst expressions: value parity with the Scala reference
  * implementations, SQL registration, and null handling. */
class ExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_fnv64 expression equals Hashing.fnv1a64 for ascii and unicode") {
    val inputs = Seq("", "hello", "héllo wörld", "的是在", "a b\tc")
    val got = inputs.toDF("s")
      .select(GraftFunctions.fnv64($"s")).as[Long].collect()
    assert(got.toSeq === inputs.map(Hashing.fnv1a64))
  }

  test("graft_simhash64 expression equals Hashing.simhash64 on token arrays") {
    val docs = Seq("the quick brown fox", "lorem ipsum dolor", "x")
    val got = docs.toDF("text")
      .select(GraftFunctions.simhash64(
        expr("filter(split(text, ' '), t -> t <> '')")).as("sh"))
      .as[Long].collect()
    val expected = docs.map(t =>
      Hashing.simhash64(t.split(" ").iterator.filter(_.nonEmpty)))
    assert(got.toSeq === expected)
  }

  test("bloom build+probe round trip: inserted keys always probe true, disjoint keys rarely") {
    val k = 5; val log2m = 16
    val inserted = (1 to 256).map(i => s"k$i")
    val pos = inserted.toDF("s")
      .select(explode(GraftFunctions.bloomPositions($"s", k, log2m)).as("p"))
      .as[Long].collect()
    assert(pos.forall(p => p >= 0 && p < (1L << log2m)), "positions out of range")
    // driver-built bitmap (same word layout the operator's bit_or fold uses)
    val bits = new Array[Long](1 << (log2m - 6))
    pos.foreach(p => bits((p >>> 6).toInt) |= 1L << (p & 63).toInt)
    val probed = (inserted ++ (1 to 256).map(i => s"x$i")).toDF("s")
      .select($"s", GraftFunctions.bloomContains(
        typedLit(bits.toSeq), $"s", k, log2m))
      .as[(String, Boolean)].collect().toMap
    inserted.foreach(s => assert(probed(s), s"inserted key $s probed false"))
    // <= 1280 of 65536 bits set -> per-key fp rate ~ 0.02^5; 256 probes
    // should see none, but allow a loose bound so the test isn't flaky
    // against future constant changes
    assert((1 to 256).count(i => probed(s"x$i")) <= 8, "false-positive burst")
    // a bits/log2m mismatch must fail loudly, not read garbage memberships
    val err = intercept[Throwable] {
      Seq("k1").toDF("s")
        .select(GraftFunctions.bloomContains(typedLit(Seq(0L)), $"s", k, log2m))
        .collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(err).contains("bitmap has"),
      s"expected the bitmap-length guard, got: ${chain(err)}")
  }

  test("graft_minhash expression equals a direct Scala computation") {
    val grams = Seq("aa bb", "bb cc", "cc dd")
    val got = Seq(grams).toDF("g")
      .select(GraftFunctions.minhash($"g", 16)).as[Seq[Long]].collect().head
    val seeds = Hashing.seeds(16)
    val expected = seeds.toSeq.map { seed =>
      grams.map(g => Hashing.mix64(Hashing.fnv1a64(g) ^ seed)).min
    }
    assert(got === expected)
  }

  test("expressions are registered for SQL use") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_fnv64('x') AS a, graft_simhash64(array('x','y')) AS b, " +
        "size(graft_minhash(array('x'))) AS c")
      .as[(Long, Long, Int)].collect().head
    assert(r._1 === Hashing.fnv1a64("x"))
    assert(r._2 === Hashing.simhash64(Iterator("x", "y")))
    assert(r._3 === 128)
  }

  test("SQL int parameters are honored, non-literal parameters error") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT size(graft_minhash(array('x'), 64)) AS k, " +
        "size(graft_wordgrams('a b c d', 2)) AS g, " +
        "graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[(Int, Int, Double)].collect().head
    assert(r._1 === 64)   // k=64 honored, not the 128 default
    assert(r._2 === 3)    // bigrams of 4 tokens
    assert(r._3 === 11.0) // 1*3 + 2*4
    // a non-foldable k must fail loudly, never silently default
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(x), cast(rand() * 4 AS INT)) " +
        "FROM (SELECT 'a' AS x)").collect()
    }
    assert(err.getMessage != null)
  }

  test("graft_wordgrams equals the builtin lambda pipeline it replaced") {
    val docs = graft.core.Tables.documents(spark, sf).select($"doc_id", $"text")
    val viaExpr = docs.select($"doc_id",
        org.apache.spark.sql.graft.GraftFunctions.wordGrams($"text", 3).as("g"))
      .as[(Long, Seq[String])].collect().map { case (id, g) => (id, g.toSet) }.toMap
    val viaLambda = docs
      .select($"doc_id", expr("filter(split(text, '\\\\s+'), x -> x <> '')").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", array_distinct(expr(
        """transform(sequence(1, size(toks) - 2),
          |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
          |                 element_at(toks, i + 2)))""".stripMargin)).as("g"))
      .as[(Long, Seq[String])].collect().map { case (id, g) => (id, g.toSet) }.toMap
    assert(viaExpr.filter(_._2.nonEmpty) === viaLambda)
    // edge cases: fewer tokens than n, empty string, extra whitespace
    val edge = Seq("one two", "", "  a   b c  ").toDF("text")
      .select(org.apache.spark.sql.graft.GraftFunctions.wordGrams($"text", 3))
      .as[Seq[String]].collect()
    assert(edge(0) === Seq.empty)
    assert(edge(1) === Seq.empty)
    assert(edge(2) === Seq("a b c"))
  }

  test("graft_rollhash expression equals Hashing.rollingHashes, incl. short inputs") {
    val inputs = Seq("", "short", "exactly8", "a longer text with spaces and 字符 in it")
    val got = inputs.toDF("s")
      .select(GraftFunctions.rollingHashes($"s", 8)).as[Seq[Long]].collect()
    assert(got.toSeq === inputs.map(Hashing.rollingHashes(_, 8).toSeq))
  }

  test("null inputs propagate as null") {
    val row = spark.sql("SELECT graft_fnv64(CAST(NULL AS STRING)) AS a").collect().head
    assert(row.isNullAt(0))
  }

  test("minhash signature similarity approximates jaccard") {
    // two token sets with jaccard 0.5 → expect roughly half the slots equal
    val a = (1 to 40).map(i => s"g$i")
    val b = (21 to 60).map(i => s"g$i")
    val df = Seq(a, b).toDF("g")
      .select(GraftFunctions.minhash($"g", 128).as("sig")).as[Seq[Long]].collect()
    val agree = df(0).zip(df(1)).count { case (x, y) => x == y } / 128.0
    val jac = 20.0 / 60.0
    assert(math.abs(agree - jac) < 0.15, s"minhash agreement $agree vs jaccard $jac")
  }
}
