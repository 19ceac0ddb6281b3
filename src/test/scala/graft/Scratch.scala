package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway instrumentation harness for r11 optimization experiments. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    graft.core.Tables.envExtraConf.foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }

    val BasketCap = 64L
    val BasketMinSupport = 2L

    def mem0 = graft.core.Tables.lineitem(s, sfDir)
      .select($"l_orderkey".as("gk"), $"l_partkey".as("node"))

    // A: current shape — distinct, cap filter join, self-join, agg
    def supportA(): DataFrame = {
      val mem = mem0.distinct()
      val ok = mem.groupBy($"gk").agg(count(lit(1)).as("n"))
        .filter($"n" <= BasketCap).select($"gk")
      val capped = mem.join(ok, "gk")
      capped.as("x").join(capped.as("y"),
          $"x.gk" === $"y.gk" && $"x.node" < $"y.node")
        .groupBy($"x.node".as("a"), $"y.node".as("b"))
        .agg(count(lit(1)).as("s_ab"))
        .filter($"s_ab" >= BasketMinSupport)
    }

    // B: one gather — sorted distinct members per group, cap filter on the
    // array, pairs exploded in-row (codegen higher-order fns), one agg
    def supportB(): DataFrame = {
      mem0.groupBy($"gk").agg(sort_array(collect_set($"node")).as("ms"))
        .filter(size($"ms").between(2, BasketCap.toInt))
        .selectExpr(
          "explode(flatten(transform(ms, (x, i) -> " +
            "transform(slice(ms, i + 2, size(ms) - i - 1), y -> struct(x AS a, y AS b))))) AS p")
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(count(lit(1)).as("s_ab"))
        .filter($"s_ab" >= BasketMinSupport)
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      t("A: support pairs (self-join)")(
        supportA().write.mode("overwrite").format("noop").save())
      s.catalog.clearCache()
      t("B: support pairs (gather+explode)")(
        supportB().write.mode("overwrite").format("noop").save())
      s.catalog.clearCache()
    }
    val a = supportA().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = supportB().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    println(s"[scratch] equal=${a == b} |A|=${a.size} |B|=${b.size} onlyA=${(a -- b).take(3)} onlyB=${(b -- a).take(3)}")
    s.stop()
  }
}
