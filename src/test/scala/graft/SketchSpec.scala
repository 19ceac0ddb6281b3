package graft

import graft.operators.Relational

/** Sketch aggregates: HLL++ estimate must track the exact distinct count
  * within its configured error bound. */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct within 5x the configured 2% rsd of exact") {
    val rows = Relational.q25ApproxDistinct(spark, sf)
      .select("l_returnflag", "approx_parts", "exact_parts")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.10, s"$flag: approx=$approx exact=$exact err=$err")
    }
  }
}
