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
}
