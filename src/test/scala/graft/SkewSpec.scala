package graft

import graft.core.Skew
import org.apache.spark.sql.functions._

/** Skew helpers must be pure rewrites: identical results to the unsalted
  * forms on data with a deliberately hot key. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 10k rows for key "hot", a few for others
  private lazy val skewed =
    ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("cold" + (i % 5), i.toLong))).toDF("k", "v")

  test("saltedAgg equals plain groupBy aggregate on skewed data") {
    val plain = skewed.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("count_v"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val salted = Skew.saltedAgg(skewed, Seq("k"),
        Seq(("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("replicatedJoin equals plain inner join with a hot key") {
    val right = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2")).toDF("k", "tag")
    val plain = skewed.join(right, "k")
      .as[(String, Long, String)].collect().sorted.toSeq
    val repl = Skew.replicatedJoin(skewed, right, "k", Seq("hot"))
      .select("k", "v", "tag")
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(repl === plain)
  }
}
