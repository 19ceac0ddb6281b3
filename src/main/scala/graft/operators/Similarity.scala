package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Hashing

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, dim 64).
  *
  *   - [[annBruteTopK]]: exact cosine top-k — the baseline and the oracle.
  *     Dot products are codegen'd `zip_with`/`aggregate`, ranking is a
  *     partitioned window; ranking key is (round(sim, 6) DESC, vec_id) so
  *     float ties can never make the result nondeterministic vs the oracle.
  *   - [[annLshTopK]]: sign-LSH (random hyperplanes) bucketed search — the
  *     scale path. Candidates come from a banded equi-join on signature
  *     chunks (never a cross join); exact cosine re-ranks candidates.
  *
  * 100 TB shape: brute force is O(Q·N) dot products and only exists for
  * verification/small Q; LSH keeps the shuffle keyed on (band, chunk) with
  * bucket sizes bounded by band width — skew-safe under AQE.
  */
object Similarity {

  val NumQueries = 5
  val TopK = 10

  private def withNorm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, 0D, (a, x) -> a + x * x)")))
  }

  /** Exact brute-force cosine top-k for the first [[NumQueries]] vectors. */
  def annBruteTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = withNorm(s, d)
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
    val scored = e.join(broadcast(q), $"vec_id" =!= $"query_id")
      .withColumn("sim",
        expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          ($"qnorm" * $"norm"))
    val w = Window.partitionBy($"query_id")
      .orderBy(round($"sim", 6).desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
        round($"sim", 4).as("cos_sim"))
  }

  val annBruteTopKOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
       |      WHERE vec_id < $NumQueries),
       |scored AS (SELECT query_id, vec_id,
       |    list_dot_product(qv, v) / (qnorm * norm) AS sim
       |  FROM n CROSS JOIN q WHERE vec_id <> query_id),
       |ranked AS (SELECT query_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(sim, 6) DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, vec_id AS neighbor_id, rank, round(sim, 4) AS cos_sim
       |FROM ranked WHERE rank <= $TopK""".stripMargin

  /** Sign-LSH bucketed ANN: 16-bit signatures, candidates = vectors sharing
    * any 4-bit signature band with the query, exact re-rank of candidates.
    * Probabilistic recall → rows-only oracle; SimilaritySpec measures
    * recall@k against [[annBruteTopK]]. */
  val SigBits = 16
  val BandBits = 4
  val NumBands: Int = SigBits / BandBits

  def signatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planes = Hashing.hyperplanes(SigBits, 64)
    Tables.embeddings(s, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, Hashing.signSignature(v, planes)) }
      .toDF("vec_id", "sig")
  }

  def annLshTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val mask = (1 << BandBits) - 1
    val bands = signatures(s, d).select($"vec_id", $"sig",
        explode(expr(s"transform(sequence(0, ${NumBands - 1}), " +
          s"b -> named_struct('band', b, 'chunk', (sig >> (b * $BandBits)) & $mask))")).as("bb"))
      .select($"vec_id", $"bb.band", $"bb.chunk")
    val qBands = bands.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"band", $"chunk")
    val cands = bands.join(broadcast(qBands), Seq("band", "chunk"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id").distinct()
    val e = withNorm(s, d)
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
    val scored = cands
      .join(e, "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("sim",
        expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          ($"qnorm" * $"norm"))
    val w = Window.partitionBy($"query_id")
      .orderBy(round($"sim", 6).desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
        round($"sim", 4).as("cos_sim"))
  }
}
