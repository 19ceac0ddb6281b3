package graft

import graft.operators.Graph

/** Fixed-point PageRank: the distributed iteration must equal the in-JVM
  * integer reference exactly (same micro-unit arithmetic), and the rank
  * order must reflect the graph structure. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pagerank equals the in-JVM fixed-point reference on a hand-built graph") {
    // star (hub 1 ↔ leaves 2..6) + a 3-cycle (10,11,12) + a pendant pair
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L))
    val got = Graph.pageRankOf(spark, edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val want = Graph.pageRankLocal(edges)
    assert(got === want)
    // the hub out-ranks every leaf; cycle nodes are symmetric
    assert(got(1L) > got(2L))
    assert(Seq(2L, 3L, 4L, 5L, 6L).map(got).distinct.size === 1)
    assert(Seq(10L, 11L, 12L).map(got).distinct.size === 1)
    assert(got(20L) === got(21L))
  }

  test("pagerank is deterministic and never loses the base mass") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val a = Graph.pageRankOf(spark, edges).as[(Long, Long)].collect().toMap
    val b = Graph.pageRankOf(spark, edges).as[(Long, Long)].collect().toMap
    assert(a === b)
    // every node's rank >= the (1-d) base mass; integer floors only ever
    // shave mass, so no rank exceeds scale * n either
    a.values.foreach { r =>
      assert(r >= Graph.PrBase && r <= Graph.PrScale * a.size)
    }
  }
}
