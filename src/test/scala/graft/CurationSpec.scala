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

  test("sequence packing: budget respected, dense seq ids, useful fill on the gate corpus") {
    import graft.operators.Sampling
    val rows = Sampling.packSequences(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val bySeq = rows.groupBy(r => (r._2, r._3))
    // every sequence fits the budget, except a singleton oversize doc
    bySeq.foreach { case ((b, sq), ds) =>
      val total = ds.map(_._4).sum
      assert(total <= Sampling.PackBudget || ds.length == 1,
        s"bucket $b seq $sq holds $total tokens in ${ds.length} docs")
    }
    // per bucket, sequence ids are dense 1..max (the next-fit fold never
    // skips or reuses an id)
    rows.groupBy(_._2).foreach { case (b, ds) =>
      val ids = ds.map(_._3).distinct.sorted
      assert(ids === (1L to ids.max), s"bucket $b seq ids: ${ids.toSeq}")
    }
    // packing is pointless if sequences are mostly padding: overall fill
    // (total tokens / sequences x budget) must clear 0.75 on this corpus
    val fill = rows.map(_._4).sum.toDouble / (bySeq.size * Sampling.PackBudget)
    assert(fill >= 0.75, s"fill = $fill over ${bySeq.size} sequences")
    info(f"pack fill = $fill%.3f over ${bySeq.size} sequences")
  }

  test("sequence packing: planted next-fit semantics incl. oversize singleton") {
    import graft.operators.Sampling
    // budget 10, one bucket; token counts 4,4,4,9,11,2 -> the next-fit
    // fold closes at every overflow and isolates the oversize doc
    val docs = Seq(4, 4, 4, 9, 11, 2).zipWithIndex.map { case (n, i) =>
      ((i + 1).toLong * 8, Seq.fill(n)("w").mkString(" ")) // ids ≡ 0 (mod 8): one bucket
    }.toDF("doc_id", "text")
    val got = Sampling.packSequencesOf(docs, budget = 10L, buckets = 8)
      .select("doc_id", "seq_no").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((8L, 1L), (16L, 1L), (24L, 2L),
      (32L, 3L), (40L, 4L), (48L, 5L)))
  }

  test("pack efficiency: report equals an independent rollup of the packing") {
    import org.apache.spark.sql.functions.col
    val packed = graft.operators.Sampling.packSequences(spark, sf)
      .select("doc_id", "bucket", "seq_no", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    // independent in-JVM rollup of the same packing
    val want = packed.groupBy(r => (r._2, r._3)).toSeq
      .map { case ((b, _), rows) => (b, rows.length.toLong, rows.map(_._4).sum) }
      .groupBy(_._1).map { case (b, seqs) =>
        val budget = graft.operators.Sampling.PackBudget
        val nSeqs = seqs.length.toLong
        (b, (b, nSeqs, seqs.map(_._2).sum, seqs.map(_._3).sum,
          nSeqs * budget, 1000L * seqs.map(_._3).sum / (nSeqs * budget),
          seqs.count(_._3 > budget).toLong))
      }
    val got = graft.operators.Sampling.packEfficiency(spark, sf)
      .select(col("bucket"), col("n_seqs"), col("n_docs"), col("n_tokens"),
        col("capacity"), col("fill_milli"), col("n_overflow"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === want.size)
    got.foreach { g => assert(g === want(g._1), s"bucket ${g._1}") }
    // the fill the packing exists to buy: every bucket ≥ 75% full
    got.foreach { g => assert(g._6 >= 750L, s"bucket ${g._1} fill ${g._6}") }
  }

  test("train/test split: bands hold, proportions near 90/5/5, id-pure and repartition-stable") {
    import graft.operators.Sampling
    val out = Sampling.trainTestSplit(spark, sf)
      .select("doc_id", "bucket", "split").as[(Long, Long, String)].collect()
    assert(out.length === 500)
    // band rule is exactly the bucket arithmetic, bucket in range
    out.foreach { case (id, b, s) =>
      assert(b >= 0 && b < Sampling.SplitBuckets, s"doc $id")
      val expect = if (b < Sampling.SplitTrainLt) "train"
        else if (b < Sampling.SplitValidLt) "valid" else "test"
      assert(s === expect, s"doc $id bucket $b")
    }
    // the JVM md5 replay pins the hash contract (salt + hex-prefix mod)
    out.take(20).foreach { case (id, b, _) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      val hex = md.map(x => f"$x%02x").mkString.take(8)
      assert(b === java.lang.Long.parseLong(hex, 16) % Sampling.SplitBuckets)
    }
    // 90/5/5 within binomial noise at n=500 (sd ≈ 6.7 docs on train)
    val n = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(n("train") > 420 && n("train") < 480, n.toString)
    assert(n.getOrElse("valid", 0) + n.getOrElse("test", 0) === 500 - n("train"))
    // membership is a pure function of doc_id: stable under repartition
    val again = Sampling.trainTestSplitOf(
        graft.core.Tables.documents(spark, sf).repartition(7))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    out.foreach { case (id, _, s) => assert(again(id) === s) }
  }

  test("curriculum order: contiguous 1..N, equals the naive global window, no Window node") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = Sampling.curriculumOrder(spark, sf)
    // the distributed recipe must not fall back to the single-partition
    // window plan it exists to avoid (nor collect data: only pid counts)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window node:\n$plan")
    val out = df.select("doc_id", "quality_score", "global_pos")
      .as[(Long, Double, Long)].collect()
    assert(out.length === 500)
    // positions are a contiguous permutation of 1..N
    assert(out.map(_._3).sorted.toSeq === (1L to 500L))
    // exact equality with the naive empty-partition window (the oracle's
    // form), key for key
    val naive = graft.operators.TextOps.qualityScore(spark, sf)
      .select($"doc_id", $"quality_score",
        expr("cast(round(quality_score * 10000) as bigint)").as("sx"),
        md5(concat(lit("order:"), $"doc_id".cast("string"))).as("h"))
      .withColumn("pos", row_number().over(
        Window.orderBy($"sx".desc, $"h".asc, $"doc_id".asc)).cast("long"))
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    out.foreach { case (id, _, pos) => assert(pos === naive(id), s"doc $id") }
    // curriculum property: the first-position doc carries the max quality
    val byPos = out.sortBy(_._3)
    assert(byPos.head._2 === out.map(_._2).max)
    // partition count respects the knob on a rerun with fewer ranges
    val small = Sampling.curriculumOrderOf(
      graft.core.Tables.documents(spark, sf), 5)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
    out.foreach { case (id, _, pos) => assert(small(id) === pos) }
  }
}
