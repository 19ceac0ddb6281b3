package graft

import org.apache.spark.sql.SparkSession

/** Eval-set-size rehearsal for the two decontamination operators: the
  * Bloom variant exists for eval sides too large to broadcast as a raw
  * gram index, so this harness grows the eval prefix from the gate's 50
  * docs to a 20%-of-corpus split and measures both operators at each
  * size. The claim under test: the exact scan's broadcast build grows
  * with the eval side while the Bloom build's output is a constant
  * 2^log2m bits, so at some eval size the exact scan stops being
  * shippable and the Bloom probe keeps the same map-only plan.
  *
  *   runMain graft.EvalRehearsal [dir=target/sf1] [evalSizes=50,2000,10000] [log2m=24]
  *
  * log2m is sized to the eval split (see [[graft.operators.Dedup
  * .bloomContaminationOf]] for the FP curve): 2^24 bits = 2 MiB holds
  * the sf1 sweep's largest eval side (~470k grams) at FP ≈ 4e-5, still
  * trivially broadcastable; a multi-million-gram eval side steps up to
  * 2^27 = 16 MiB. The 3rd arg exists to DEMONSTRATE both halves of that
  * guidance: the sf3 sweep at eval=30k (1.41M grams) measurably breaks
  * knife-edge parity at 2^24 (FP ≈ 0.5% flips just-below-threshold docs
  * to bloom-flagged) and restores it at 27 — the over-drop onset and its
  * remedy, both observed rather than calculated. */
object EvalRehearsal {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val sizes = (if (args.length > 1) args(1) else "50,2000,10000")
      .split(",").map(_.trim.toLong).toSeq
    val log2m = if (args.length > 2) args(2).toInt else 24
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._

    val docs = graft.core.Tables.documents(spark, dir)
    def timed(f: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }

    // planted ground truth, when the corpus was generated with
    // contamPerMille > 0: ScaleGen's contam_manifest.parquet records every
    // planted doc's (eval_base, kind, target_pct) — kind 0 is the strong
    // ≈0.9-containment recall plant, kinds 1-3 are the BORDERLINE plants
    // at target containment 26/30/34% straddling BloomHitMin = 0.3, where
    // a single Bloom false positive could flip a verdict
    val manifest =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/contam_manifest.parquet")))
        Some(spark.read.parquet(s"$dir/contam_manifest.parquet").cache())
      else None

    sizes.foreach { evalMax =>
      val bloomFlagged = graft.operators.Dedup.bloomContaminationOf(
        docs, evalMax, 5, log2m)
      val nEvalGrams = docs.filter(col("doc_id") < evalMax)
        .select(explode(org.apache.spark.sql.graft.GraftFunctions
          .wordGrams(col("text"), 3)).as("gram"))
        .agg(count_distinct(col("gram"))).head().getLong(0)
      val exactFlagged = graft.operators.Dedup.contaminationOf(docs, evalMax)
        .select("train_doc").distinct()
      val (tExact, nExact) = timed { exactFlagged.count() }
      val (tBloom, nBloom) = timed { bloomFlagged.count() }
      println(f"[evalrehearsal] eval=$evalMax%-6d evalGrams=$nEvalGrams%-9d " +
        f"exact=${tExact}%6.2fs (flagged=$nExact) " +
        f"bloom=${tBloom}%6.2fs (flagged=$nBloom, " +
        s"bitmap=2^$log2m bits const)")

      manifest.foreach { m =>
        // whole-corpus parity first: the two scans must flag the SAME doc
        // set (the Bloom filter at this geometry should introduce zero
        // verdict flips — measured, not assumed). Cached AFTER the timed
        // section: the two except()s and the accounting join below would
        // otherwise rebuild the bloom bitmap and re-broadcast the eval
        // gram index five more times per eval size.
        val ef = exactFlagged.withColumnRenamed("train_doc", "doc_id").cache()
        val bf = bloomFlagged.select(col("train_doc").as("doc_id")).cache()
        val onlyExact = ef.except(bf).count()
        val onlyBloom = bf.except(ef).count()
        println(f"[evalrehearsal] eval=$evalMax%-6d parity: " +
          s"exact-only=$onlyExact bloom-only=$onlyBloom " +
          (if (onlyExact == 0 && onlyBloom == 0) "(flag sets IDENTICAL)"
           else "(MISMATCH)"))
        // per-kind planted accounting; planted docs that fell inside the
        // eval prefix are eval docs now, not train docs — excluded
        val planted = m.filter(col("doc_id") >= evalMax)
        val acc = planted
          .join(ef.withColumn("x", lit(1)), Seq("doc_id"), "left")
          .join(bf.withColumn("b", lit(1)), Seq("doc_id"), "left")
          .groupBy(col("kind"), col("target_pct"))
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("x"), lit(0))).as("exact_hit"),
            sum(coalesce(col("b"), lit(0))).as("bloom_hit"),
            sum(when(coalesce(col("x"), lit(0)) =!= coalesce(col("b"), lit(0)), 1L)
              .otherwise(0L)).as("flips"))
          .orderBy(col("kind")).collect()
        acc.foreach { r =>
          val kind = r.getLong(0); val tgt = r.getInt(1)
          val n = r.getLong(2); val eh = r.getLong(3)
          val bh = r.getLong(4); val fl = r.getLong(5)
          val label = if (kind == 0) "strong" else s"borderline($tgt%)"
          println(f"[evalrehearsal] eval=$evalMax%-6d planted $label%-16s " +
            f"n=$n%-5d exact_flagged=$eh%-5d bloom_flagged=$bh%-5d " +
            s"verdict_flips=$fl" +
            (if (kind == 0 && (eh != n || bh != n)) "  RECALL<1.0!" else "") +
            (if (fl != 0) "  PARITY BROKEN!" else ""))
        }
        ef.unpersist(); bf.unpersist()
      }
    }
    spark.stop()
  }
}
