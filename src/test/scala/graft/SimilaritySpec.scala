package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("brute-force top-k: k results per query, self excluded, rank consistent") {
    val rows = Similarity.annBruteTopK(spark, sf)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Int, Double)].collect()
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet === (0L until Similarity.NumQueries).toSet)
    byQuery.values.foreach { g =>
      assert(g.length === Similarity.TopK)
      assert(g.forall(r => r._2 != r._1))            // no self match
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._4).toSeq.reverse === sorted.map(_._4).toSeq.sorted) // sim desc by rank
    }
  }

  test("LSH ANN recall@10 vs brute force is useful") {
    val brute = Similarity.annBruteTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.annLshTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    // sign-LSH on 64-dim random embeddings with 16-bit signatures is an
    // approximate method: require it clearly beats random neighbor picking
    // (random recall ≈ k/N = 10/500 = 0.02).
    assert(recall >= 0.30, s"recall@10 = $recall")
  }

  test("IVF ANN recall@10 vs brute force is useful and beats random") {
    val brute = Similarity.annBruteTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvfTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    // probing 4/16 cells scans ~25% of the corpus; random picking at that
    // budget would land recall ≈ 0.25. Measured 0.74 (deterministic) with
    // unbiased k-means++ seeding — and that is near the CEILING of this
    // corpus: exhaustive best-4-cells-per-query analysis (oracle probe
    // selection over the converged clustering) caps recall at 0.80, because
    // the synthetic embeddings are near-uniform and each query's true
    // top-10 spans 5-8 cells. Round 3's 0.86 was queries-as-seeds
    // overfitting (ids 0..15 seeded the cells, ids 0..4 are the queries),
    // not a better index. Bound at 0.70 for determinism headroom.
    assert(recall >= 0.70, s"IVF recall@10 = $recall")
    info(s"IVF recall@10 = $recall")
  }

  test("filtered ANN: label predicate holds, recall vs filtered brute force is useful") {
    // exact filtered ground truth, computed independently in the JVM:
    // per query, cosine top-k over SAME-label corpus vectors only
    val rows = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v", "label")
      .as[(Long, Array[Double], Int)].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = rows.filter(_._1 < Similarity.NumQueries).flatMap { case (qid, qv, ql) =>
      rows.filter(r => r._1 != qid && r._3 == ql)
        .map(r => (r._1, BigDecimal(cos(qv, r._2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
        .sortBy { case (id, sim) => (-sim, id) }
        .take(Similarity.TopK).map { case (id, _) => (qid, id) }
    }.toSet
    val got = Similarity.annFilteredTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // every returned neighbor satisfies the predicate
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    got.foreach { case (q, n) => assert(labelOf(n) === labelOf(q) && n != q) }
    // the engine's filtered brute truth (the ann_recall_report `filtered`
    // leg's denominator) must equal this independent in-JVM ground truth
    val engineTruth = Similarity.annFilteredBruteTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(engineTruth === truth,
      "annFilteredBruteTopK must reproduce the in-JVM filtered ground truth")
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(s"filtered ANN recall@10 = $recall")
    // widened probe ring (2x) compensates the label thinning; random
    // selection at the 8/16-cell budget would land ≈ 0.5
    assert(recall >= 0.60, s"filtered recall@10 = $recall")
    // deterministic
    val again = Similarity.annFilteredTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(again === got)
  }

  test("hard-negative mining: different-label predicate holds, recall vs negated brute is useful") {
    // exact ground truth, computed independently in the JVM: per query,
    // cosine top-k over DIFFERENT-label corpus vectors only
    val rows = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v", "label")
      .as[(Long, Array[Double], Int)].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = rows.filter(_._1 < Similarity.NumQueries).flatMap { case (qid, qv, ql) =>
      rows.filter(r => r._1 != qid && r._3 != ql)
        .map(r => (r._1, BigDecimal(cos(qv, r._2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
        .sortBy { case (id, sim) => (-sim, id) }
        .take(Similarity.TopK).map { case (id, _) => (qid, id) }
    }.toSet
    val got = Similarity.annHardNegatives(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // every mined negative really is a different-label vector
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    got.foreach { case (q, n) => assert(labelOf(n) != labelOf(q) && n != q) }
    // the engine's negated brute truth (the ann_recall_report `hardneg`
    // leg's denominator) must equal this independent in-JVM ground truth
    val engineTruth = Similarity.annHardNegBruteTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(engineTruth === truth,
      "annHardNegBruteTopK must reproduce the in-JVM negated ground truth")
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(s"hard-negative recall@10 = $recall")
    // the negated predicate keeps ~ (L-1)/L of the corpus eligible, so the
    // widened 8/16-cell probe ring behaves like unfiltered IVF (≥ 0.70
    // there); bound lower for label-geometry headroom
    assert(recall >= 0.60, s"hardneg recall@10 = $recall")
    val again = Similarity.annHardNegatives(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(again === got)
  }

  test("contrastive triplets: one positive + bounded negatives per anchor, roles honor labels, margins real") {
    val rows = Similarity.contrastiveTriplets(spark, sf)
      .as[(Long, String, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    val labelOf = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    rows.foreach { case (a, role, p, _, _) =>
      assert(p != a, s"anchor $a paired with itself")
      role match {
        case "pos" => assert(labelOf(p) === labelOf(a), s"positive $p label")
        case "neg" => assert(labelOf(p) !== labelOf(a), s"negative $p label")
        case r     => fail(s"unknown role $r")
      }
    }
    rows.groupBy(_._1).foreach { case (a, rs) =>
      val (pos, neg) = rs.partition(_._2 == "pos")
      // every emitted anchor carries EXACTLY one positive (triplets
      // without a positive are untrainable and must not leak through)
      assert(pos.length === 1, s"anchor $a: ${pos.length} positives")
      assert(neg.length <= Similarity.ContrastiveNegatives,
        s"anchor $a: too many negatives")
      assert(neg.map(_._4).sorted.toSeq === (1 to neg.length),
        s"anchor $a: negative ranks not contiguous")
      // the legs agree with their source operators
      val wantPos = Similarity.annFilteredTopK(spark, sf)
        .filter(s"query_id = $a AND rank = 1")
        .select("neighbor_id").as[Long].collect()
      assert(wantPos.toSeq === pos.map(_._3).toSeq, s"anchor $a: positive leg")
    }
    val again = Similarity.contrastiveTriplets(spark, sf)
      .as[(Long, String, Long, Int, Double)].collect()
    assert(again.toSet === rows.toSet)
  }

  test("drift report: halves partition the corpus, share arithmetic exact, deterministic") {
    val rows = Similarity.embedDriftReport(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = graft.core.Tables.embeddings(spark, sf).count()
    val nEven = graft.core.Tables.embeddings(spark, sf)
      .filter("vec_id % 2 = 0").count()
    // every vector lands in exactly one cell on its own side
    assert(rows.map(_._2).sum === nEven, "train half partition")
    assert(rows.map(_._3).sum === total - nEven, "ingest half partition")
    val (tTrain, tIngest) = (nEven, total - nEven)
    rows.foreach { case (c, nt, ni, st, si, d) =>
      assert(st === nt * 1000000L / tTrain, s"cell $c train share")
      assert(si === ni * 1000000L / tIngest, s"cell $c ingest share")
      assert(d === si - st, s"cell $c delta")
    }
    // truncated integer shares sum to <= 1e6 and within |cells| micros of it
    val sumT = rows.map(_._4).sum
    assert(sumT <= 1000000L && sumT > 1000000L - rows.length)
    val again = Similarity.embedDriftReport(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(again.toSet === rows.toSet)
  }

  test("cluster terms: c-TF-IDF labeling agrees with an in-JVM recount over the same cells") {
    val terms = Similarity.clusterTerms(spark, sf)
      .as[(Long, String, Long, Int, Double)].collect()
    assert(terms.nonEmpty)
    val cells = terms.map(_._1).distinct
    // same cell set as the profile (both ride the same trained codebook)
    val profCells = Similarity.clusterProfile(spark, sf)
      .select("cell").as[Long].collect().toSet
    assert(cells.toSet.subsetOf(profCells))
    terms.groupBy(_._1).foreach { case (c, rs) =>
      assert(rs.length <= Similarity.ClusterTermsK)
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1 to rs.length), s"cell $c ranks")
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._5 >= b._5 - 1e-9, s"cell $c order")
        case _ =>
      }
    }
    // full in-JVM c-TF-IDF recount from the operator's own cell
    // assignment (profile gives counts, not membership — recompute the
    // (cell, word) pool from documents joined on the terms' cells via
    // the score formula instead: verify each emitted score)
    val nCells = profCells.size.toDouble
    // df_cells per word: recount from the emitted tf table is not
    // possible (truncated), so verify the formula on the emitted rows:
    // score = tf * ln(nCells / df_cells) => df_cells = nCells / exp(s/tf)
    terms.filter(_._5 > 0).foreach { case (c, w, tf, _, s4) =>
      val dfEst = nCells / math.exp(s4 / tf)
      val dfRounded = math.round(dfEst)
      assert(dfRounded >= 1 && dfRounded <= nCells.toLong, s"cell $c '$w' df")
      val recomputed = BigDecimal(tf * math.log(nCells / dfRounded))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(recomputed - s4) < 2e-4, s"cell $c '$w' score")
    }
    val again = Similarity.clusterTerms(spark, sf)
      .as[(Long, String, Long, Int, Double)].collect()
    assert(again.toSet === terms.toSet)
  }

  test("cluster profile: partitions the corpus, purity arithmetic exact, deterministic") {
    val prof = Similarity.clusterProfile(spark, sf)
      .as[(Long, Long, Int, Long, Long)].collect()
    val nCorpus = graft.core.Tables.embeddings(spark, sf).count()
    // cells partition the corpus: populations sum to |corpus|
    assert(prof.map(_._2).sum === nCorpus)
    assert(prof.length <= Similarity.IvfCells)
    val nLabels = graft.core.Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    prof.foreach { case (_, n, _, topN, purity) =>
      assert(topN >= 1L && topN <= n)
      assert(purity === topN * 1000L / n)
      assert(purity >= 1000L / nLabels) // the argmax meets the uniform floor
    }
    val again = Similarity.clusterProfile(spark, sf)
      .as[(Long, Long, Int, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === prof.sortBy(_._1).toSeq)
  }

  test("SemDeDup: precision 1 vs exact pairs, recall bounded, deterministic") {
    // exact ground truth: vectors with ANY lower-id neighbor at cos >= tau
    // anywhere in the corpus (the all-pairs verifier's keep-first rule)
    val exact = graft.operators.Dedup.embeddingPairs(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val truthDropped = exact.map(_._2).toSet // vec_b > vec_a always
    val sem = Similarity.semanticDedup(spark, sf)
      .select("vec_id", "kept_id").as[(Long, Long)].collect()
    val semDropped = sem.map(_._1).toSet
    // precision 1: every SemDeDup drop IS a true near-dup (cell-blocking
    // only restricts WHICH pairs are compared, never invents similarity),
    // and its kept_id is a true lower-id tau-neighbor
    assert(semDropped.subsetOf(truthDropped),
      s"false drops: ${semDropped -- truthDropped}")
    val exactSet = exact.toSet
    assert(sem.forall { case (v, k) => exactSet.contains((k, v)) })
    // recall: cross-cell pairs are missed BY DESIGN; require the cells
    // to capture a useful majority at gate scale
    val recall = semDropped.size.toDouble / math.max(truthDropped.size, 1)
    assert(recall >= 0.30, s"SemDeDup recall = $recall")
    info(s"SemDeDup drop recall vs exact = $recall " +
      s"(${semDropped.size}/${truthDropped.size})")
    // determinism: the whole pipeline (seeds, Lloyd, assignment, drops)
    // must reproduce bit-for-bit run to run
    val again = Similarity.semanticDedup(spark, sf)
      .select("vec_id", "kept_id").as[(Long, Long)].collect()
    assert(again.toSet === sem.toSet)
  }

  test("int8 quantization: bounded reconstruction error, top-k mostly stable") {
    val qs = Similarity.quantizeEmbeddings(spark, sf)
      .as[(Long, Double, Array[Byte])].collect()
      .map { case (id, sc, q) => id -> (sc, q) }.toMap
    val vs = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)")
      .as[(Long, Array[Double])].collect().toMap
    assert(qs.keySet === vs.keySet)
    vs.foreach { case (id, v) =>
      val (scale, q) = qs(id)
      v.indices.foreach { i =>
        val deq = q(i) * scale
        assert(math.abs(deq - v(i)) <= scale / 2 + 1e-12,
          s"vec $id component $i: $deq vs ${v(i)} (scale $scale)")
      }
    }
    // cosine between original and dequantized vector stays ~1
    qs.foreach { case (id, (scale, q)) =>
      val v = vs(id)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      v.indices.foreach { i =>
        val d = q(i) * scale
        dot += v(i) * d; na += v(i) * v(i); nb += d * d
      }
      val cos = dot / math.sqrt(na * nb)
      assert(cos > 0.999, s"vec $id degraded to cos=$cos")
    }
  }

  test("LSH signatures are deterministic across evaluations") {
    val a = Similarity.signatures(spark, sf).as[(Long, Int)].collect().toMap
    val b = Similarity.signatures(spark, sf).as[(Long, Int)].collect().toMap
    assert(a === b)
  }

  test("random-projection reduction: exact recompute, JL inner-product estimate useful") {
    import graft.functions.Hashing
    val out = Similarity.reduceEmbeddings(spark, sf)
      .as[(Long, Int, Long)].collect()
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect().toMap
    assert(out.length === vecs.size * Similarity.RpDims)
    // distributed micros == driver-side recomputation (bit-exact)
    val planes = Hashing.hyperplanes(Similarity.RpDims, 64, Similarity.RpSeed)
    val reduced = out.groupBy(_._1).view.mapValues { rs =>
      val arr = new Array[Long](Similarity.RpDims)
      rs.foreach { case (_, c, m) => arr(c) = m }
      arr
    }.toMap
    vecs.take(50).foreach { case (id, v) =>
      planes.indices.foreach { p =>
        var dot = 0.0; var j = 0
        while (j < 64) { dot += v(j) * planes(p)(j); j += 1 }
        assert(reduced(id)(p) === math.floor(dot * 1e6 + 0.5).toLong, s"vec $id comp $p")
      }
    }
    // the family must be independent of the LSH signature planes
    assert(Hashing.hyperplanes(1, 64, Similarity.RpSeed).head.toSeq !==
      Hashing.hyperplanes(1, 64).head.toSeq)
    // JL estimator quality: 3/RpDims * <Rx, Ry> tracks <x, y> — Pearson
    // correlation over sampled pairs (deterministic planes, fixed corpus)
    val ids = vecs.keys.toArray.sorted.take(60)
    val (est, exact) = (for {
      i <- ids.indices; k <- (i + 1) until ids.length
    } yield {
      val (a, b) = (ids(i), ids(k))
      val rd = reduced(a).zip(reduced(b)).map { case (x, y) => x / 1e6 * (y / 1e6) }.sum
      var dot = 0.0; var j = 0
      while (j < 64) { dot += vecs(a)(j) * vecs(b)(j); j += 1 }
      (3.0 / Similarity.RpDims * rd, dot)
    }).unzip
    def pearson(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.length
      val (mx, my) = (x.sum / n, y.sum / n)
      val cov = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val (sx, sy) = (math.sqrt(x.map(a => (a - mx) * (a - mx)).sum),
        math.sqrt(y.map(b => (b - my) * (b - my)).sum))
      cov / (sx * sy)
    }
    val r = pearson(est, exact)
    info(f"JL inner-product Pearson r = $r%.3f over ${est.length} pairs")
    // the synthetic corpus is near-orthogonal (pairwise dots ~ 0), so the
    // cross-dot estimate sits in JL's noise-dominated regime — require it
    // to TRACK (r > 0.3), and pin the strong JL guarantee on norms below
    assert(r > 0.3, f"JL estimate too distorted: r = $r%.3f")
    // norm preservation: 3/RpDims * ||Rx||^2 estimates ||x||^2 with
    // relative error ~ sqrt(2/RpDims) ≈ 0.35 per vector; the median over
    // vectors must be comfortably inside that
    val normErrs = ids.map { id =>
      val rn = reduced(id).map(m => m / 1e6 * (m / 1e6)).sum * 3.0 / Similarity.RpDims
      var nn = 0.0; var j = 0
      while (j < 64) { nn += vecs(id)(j) * vecs(id)(j); j += 1 }
      math.abs(rn - nn) / nn
    }.sorted
    val med = normErrs(normErrs.length / 2)
    info(f"JL norm-estimate median relative error = $med%.3f")
    assert(med < 0.4, f"JL norm estimate too distorted: median $med%.3f")
  }

  test("PQ codes: deterministic, self-coding corpus reconstructs exactly, codes compress") {
    import spark.implicits._
    // corpus of <= PqK vectors: every vector is a seed, so after Lloyd
    // each distinct subvector is its own centroid (up to the 2^-30
    // fixed-point quantum) and reconstruction error rounds to zero
    val tiny = (0L until 12L).map { id =>
      (id, Array.tabulate(64)(i => math.sin(id * 64.0 + i)))
    }
    // codes_packed is Σ code(sub) << 4·sub — unpack for the assertions
    def unpack(p: Long): Seq[Long] =
      (0 until Similarity.PqSub).map(sub => (p >> (4 * sub)) & 0xFL)
    val tinyCodes = Similarity.pqCodesOf(spark, tiny.toDS())
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(tinyCodes.length === 12)
    tinyCodes.foreach { case (id, packed, err6) =>
      val codes = unpack(packed)
      assert(codes.length === Similarity.PqSub)
      assert(codes.forall(c => c >= 0 && c < Similarity.PqK))
      assert(err6 === 0.0, s"vec $id should self-reconstruct, err=$err6")
    }
    // identical vectors share a code word
    val dup = Seq((0L, Array.fill(64)(0.5)), (1L, Array.fill(64)(0.5)),
      (2L, Array.fill(64)(-0.25))).toDS()
    val dupCodes = Similarity.pqCodesOf(spark, dup)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(dupCodes(0)._2 === dupCodes(1)._2)
    assert(dupCodes(0)._2 !== dupCodes(2)._2)

    // sf corpus: two runs bit-identical; codes bounded; errors finite
    val a = Similarity.pqCodes(spark, sf)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val b = Similarity.pqCodes(spark, sf)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(r => unpack(r._2).forall(c => c >= 0 && c < Similarity.PqK)))
    assert(a.forall(r => r._3 >= 0.0 && !r._3.isNaN))
    // the trained codebook must do useful work: mean reconstruction error
    // beats the k=1 baseline (quantizing every vector to the corpus mean)
    val raw = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>)")
      .as[Array[Double]].collect()
    val mean = Array.tabulate(64)(i => raw.map(_(i)).sum / raw.length)
    val err1 = raw.map(v => v.zip(mean).map { case (x, m) =>
      (x - m) * (x - m)
    }.sum).sum / raw.length
    val errPq = a.map(_._3).sum / a.length
    info(f"mean PQ err = $errPq%.4f vs k=1 baseline $err1%.4f")
    // on iid-random data the k=16/8-dim rate-distortion bound is ≈ 0.5×
    // the k=1 error (16^(-2/8)); require a clear win, not the bound
    assert(errPq < err1 * 0.75,
      f"PQ reconstruction ($errPq%.4f) should clearly beat the global-mean baseline ($err1%.4f)")
  }

  test("PQ ADC ANN recall@10 vs brute force is useful and beats random") {
    import spark.implicits._
    val brute = Similarity.annBruteTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.annPqTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(pq.keySet === brute.keySet)
    val n = graft.core.Tables.embeddings(spark, sf).count().toDouble
    val recalls = brute.map { case (q, want) =>
      pq(q).intersect(want).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    // a random 50-shortlist would recall ~ AdcShortlist/n of the true
    // top-10; ADC on 8-byte codes must do far better
    val randomBaseline = Similarity.AdcShortlist / n
    info(f"PQ-ADC recall@10 = $recall%.2f (random shortlist ≈ $randomBaseline%.2f)")
    assert(recall >= 0.5, f"PQ-ADC recall too low: $recall%.2f")
    assert(recall > 4 * randomBaseline)
  }

  test("IVF+PQ composed ANN: contract, determinism, recall beats random") {
    import spark.implicits._
    val res = Similarity.annIvfPqTopK(spark, sf)
      .as[(Long, Long, Int, Double)].collect()
    // contract: every query emits exactly TopK ranked rows, ranks 1..k,
    // never the query itself
    val byQ = res.groupBy(_._1)
    assert(byQ.keySet === (0L until Similarity.NumQueries).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length === Similarity.TopK)
      assert(rows.map(_._3).sorted.toSeq === (1 to Similarity.TopK))
      assert(rows.forall(_._2 != q))
    }
    // deterministic end to end (both trainings are fixed-point)
    val again = Similarity.annIvfPqTopK(spark, sf)
      .as[(Long, Long, Int, Double)].collect()
    assert(res.sortBy(r => (r._1, r._3)).toSeq ===
      again.sortBy(r => (r._1, r._3)).toSeq)
    // recall: the composition can only lose vs each half alone (IVF
    // bounds candidates, PQ distorts ranks within them) — require it
    // still clearly beats random neighbor picking at its scan budget
    val brute = Similarity.annBruteTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = res.map(r => (r._1, r._2)).toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    info(f"IVF+PQ recall@10 = $recall%.2f")
    assert(recall >= 0.30, f"IVF+PQ recall too low: $recall%.2f")
  }

  test("bitext margin mining: forward-best pairs, margin arithmetic, threshold on rounded value") {
    import spark.implicits._
    val got = Similarity.bitextMarginPairs(spark, sf)
      .as[(Long, Long, Double, Double, Boolean)].collect()
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var num = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        num += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      num / (math.sqrt(na) * math.sqrt(nb))
    }
    val xs = vecs.keySet.filter(id => id % 2 == 0 && id < Similarity.BitextQueries)
    val ys = vecs.keySet.filter(_ % 2 == 1).toSeq.sorted
    assert(got.length === xs.size, "one mined pair per source query")
    assert(got.map(_._1).toSet === xs)
    got.foreach { case (src, tgt, cosSim, margin, accepted) =>
      assert(tgt % 2 == 1, s"$src: target not in the odd half")
      val sims = ys.map(y => y -> cos(vecs(src), vecs(y))).toMap
      // the mined target is the true cosine argmax over the target half
      assert(math.abs(sims(tgt) - ys.map(sims).max) < 1e-9,
        s"$src: $tgt is not the forward-best target")
      assert(math.abs(sims(tgt) - cosSim) < 1e-3, s"$src: cosine off")
      // margin denominators: mean of top-k forward sims and of the
      // target's top-k sims over the query batch
      val dx = ys.map(sims).sorted.reverse.take(Similarity.BitextK)
        .sum / Similarity.BitextK
      val back = xs.toSeq.map(x => cos(vecs(x), vecs(tgt)))
        .sorted.reverse.take(Similarity.BitextK)
      val dy = back.sum / back.length
      val wantMargin = 2 * sims(tgt) / (dx + dy)
      assert(math.abs(margin - wantMargin) < 1e-3, s"$src: margin off")
      assert(accepted === (margin >= Similarity.BitextMarginThreshold),
        s"$src: accept flag disagrees with the rounded margin")
    }
    val again = Similarity.bitextMarginPairs(spark, sf)
      .as[(Long, Long, Double, Double, Boolean)].collect()
    assert(again.toSet === got.toSet)
  }

  test("power iteration: integer iterate tracks its double twin; Rayleigh quotient climbs") {
    import spark.implicits._
    val got = Similarity.powerIteration(spark, sf)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2.toDouble)
    assert(got.length === 64)
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(x => math.rint(x.toDouble * 1000)))
    def gram(w: Array[Double]): Array[Double] = {
      val c = Array.fill(64)(0.0)
      q.foreach { row =>
        val s = row.indices.map(j => row(j) * w(j)).sum
        row.indices.foreach(j => c(j) += row(j) * s)
      }
      c
    }
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // double twin: SAME K rounds and the same max-abs renormalization, no
    // integer truncation — the engine promises the fixed-K iterate, and
    // must sit within the accumulated <=1e-3/round truncation noise of it
    var w = Array.fill(64)(1000.0)
    val rayleigh = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to Similarity.PowerIters) {
      val c = gram(w)
      // Rayleigh quotient wᵀ(XᵀX)w / wᵀw for the PRE-update iterate
      rayleigh += w.indices.map(i => w(i) * c(i)).sum /
        w.indices.map(i => w(i) * w(i)).sum
      val m = c.map(math.abs).max
      w = c.map(_ * 1000.0 / m)
    }
    assert(cos(got, w) > 0.999, s"cos vs double twin = ${cos(got, w)}")
    // power iteration on a PSD matrix: the Rayleigh quotient is monotone
    // nondecreasing round over round (convergence toward lambda_1)
    rayleigh.toSeq.sliding(2).foreach { pair =>
      val (a, b) = (pair.head, pair.last)
      assert(b >= a * (1 - 1e-12), s"Rayleigh dropped: $a -> $b")
    }
    // exact integer arithmetic: the result is a constant of the input,
    // whatever the partitioning of the shuffles that produced it
    val again = Similarity.powerIteration(spark, sf)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(again.toSeq === got.map(_.toLong).toSeq)
  }

  test("matryoshka report: full-width control row exact, values bounded, deterministic") {
    val got = Similarity.matryoshkaReport(spark, sf)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Similarity.MrlDims)
    // the full-width row is the internal control: truncation at the full
    // dimension changes nothing, so recall is exactly 1.0 and delta 0
    val control = got.last
    assert(control._2 === 1000000L)
    assert(control._3 === 0L)
    // every row is a valid (recall, delta) pair
    got.foreach { case (dim, rec, dl) =>
      assert(rec >= 0L && rec <= 1000000L, s"dim $dim recall")
      assert(dl >= 0L, s"dim $dim delta")
    }
    // the report is a pure function of the corpus
    val again = Similarity.matryoshkaReport(spark, sf)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === got.toSeq)
  }
}
