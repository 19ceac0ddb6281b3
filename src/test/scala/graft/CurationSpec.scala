package graft

import graft.operators.{Dedup, Sampling, TextOps}

/** End-to-end curation pipeline invariants (quality filter ∘ dedup keep ∘
  * shard assignment) — the stage composition a training-data job runs. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("curation pipeline: only kept high-quality docs, dense deterministic shards") {
    val out = Sampling.curationPipeline(spark, sf)
      .select("doc_id", "quality_score", "shard", "pos")
      .as[(Long, Double, Int, Int)].collect()
    assert(out.nonEmpty)

    // every surviving doc passes the quality bar
    assert(out.forall(_._2 >= 0.5))

    // every surviving doc is its cluster's representative (keep = true)
    val keep = Dedup.keepList(spark, sf)
      .filter($"keep").select("doc_id").as[Long].collect().toSet
    assert(out.forall(r => keep.contains(r._1)))

    // nothing eligible was dropped: kept ∩ quality>=0.5 == pipeline output
    val quality = TextOps.qualityScore(spark, sf)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val eligible = keep.filter(id => quality(id) >= 0.5)
    assert(out.map(_._1).toSet === eligible)

    // shard = doc_id % 8; positions within a shard are dense 1..n
    assert(out.forall(r => r._3 === (r._1 % 8).toInt))
    out.groupBy(_._3).foreach { case (shard, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length), s"shard $shard")
    }

    // deterministic: rerun yields the identical assignment
    val again = Sampling.curationPipeline(spark, sf)
      .select("doc_id", "quality_score", "shard", "pos")
      .as[(Long, Double, Int, Int)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }
}
