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
  *   runMain graft.EvalRehearsal [dir=target/sf1] [evalSizes=50,2000,10000]
  *
  * log2m is sized to the eval split (see [[graft.operators.Dedup
  * .bloomContaminationOf]] for the FP curve): 2^24 bits = 2 MiB holds
  * this sweep's largest eval side (~470k grams) at FP ≈ 4e-5, still
  * trivially broadcastable; a multi-million-gram eval side would step up
  * to 2^27 = 16 MiB. */
object EvalRehearsal {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val sizes = (if (args.length > 1) args(1) else "50,2000,10000")
      .split(",").map(_.trim.toLong).toSeq
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

    sizes.foreach { evalMax =>
      val bloomFlagged = graft.operators.Dedup.bloomContaminationOf(
        docs, evalMax, 5, 24)
      val nEvalGrams = docs.filter(col("doc_id") < evalMax)
        .select(explode(org.apache.spark.sql.graft.GraftFunctions
          .wordGrams(col("text"), 3)).as("gram"))
        .agg(count_distinct(col("gram"))).head().getLong(0)
      val (tExact, nExact) = timed {
        graft.operators.Dedup.contaminationOf(docs, evalMax)
          .select("train_doc").distinct().count()
      }
      val (tBloom, nBloom) = timed { bloomFlagged.count() }
      println(f"[evalrehearsal] eval=$evalMax%-6d evalGrams=$nEvalGrams%-9d " +
        f"exact=${tExact}%6.2fs (flagged=$nExact) " +
        f"bloom=${tBloom}%6.2fs (flagged=$nBloom, bitmap=2MiB const)")
    }
    spark.stop()
  }
}
