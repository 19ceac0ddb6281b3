package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Corpus-level curation analytics over the `documents` table — the
  * provenance/mixture layer of a training-data pipeline: per-source
  * profiles, temperature-based sampling weights, per-document salient
  * terms (tf-idf). The reference platform has no corpus layer at all (its
  * data model is schema-free text lines, SURVEY.md §1.2); these are the
  * operators a user graduating from hand-rolled Maple/Juice scripts needs
  * once their corpus has provenance.
  */
object Corpus {

  /** Per-source corpus profile: document count, character mass, language
    * spread — the table a data-mixture decision reads. One hash aggregate
    * keyed on source (map-side partial; output is |sources| rows). */
  def sourceStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        round(avg($"n_chars"), 2).as("avg_chars"),
        countDistinct($"lang").as("n_langs"))
  }

  val sourceStatsOracle: String =
    """SELECT source, count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS total_chars,
      | round(avg(n_chars), 2) AS avg_chars,
      | count(DISTINCT lang) AS n_langs
      |FROM documents GROUP BY source""".stripMargin

  /** Temperature-based sampling weights per source: w ∝ n_docs^alpha,
    * normalized — the standard up/down-weighting of data mixtures
    * (alpha < 1 flattens toward uniform, the multilingual-sampling
    * formula). The whole-partition window runs over |sources| rows (the
    * aggregate's output), bounded by construction at any corpus size. */
  val MixAlpha = 0.7

  def mixWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bySource = Tables.documents(s, d)
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val all = Window.partitionBy(lit(1))
    bySource
      .withColumn("w_raw", pow($"n_docs", MixAlpha))
      .withColumn("weight", round($"w_raw" / sum($"w_raw").over(all), 6))
      .select($"source", $"n_docs", round($"w_raw", 4).as("w_raw"), $"weight")
  }

  val mixWeightsOracle: String =
    s"""WITH b AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
       |SELECT source, n_docs, round(pow(n_docs, $MixAlpha), 4) AS w_raw,
       | round(pow(n_docs, $MixAlpha) / sum(pow(n_docs, $MixAlpha)) OVER (), 6) AS weight
       |FROM b""".stripMargin

  /** Per-document salient terms: top-[[TfidfTopK]] by tf·idf
    * (idf = ln(N/df)) with a deterministic (score DESC, term ASC)
    * tie-break — keyword extraction / topic signal for curation.
    *
    * Shape: explode → two-phase (doc, term) counts → vocabulary join for
    * df (AQE sizes it — the vocabulary is corpus-proportional, so no
    * broadcast hint) → per-doc window over ≤ |terms(doc)| rows. N is one
    * scalar count — constant driver traffic. */
  val TfidfTopK = 3

  def tfidfTopTerms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    // N as a broadcast single-row aggregate (the scalar-subquery shape):
    // part of the one plan, so no separate driver-side count() action/scan
    val n = docs.agg(count(lit(1)).cast("double").as("n_total"))
    val words = docs.select($"doc_id",
      explode(expr("filter(split(text, '\\\\s+'), x -> x <> '')")).as("term"))
    val tf = words.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", $"tf" * log($"n_total" / $"df"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TfidfTopK)
      .select($"doc_id", $"term", $"tf", $"rank", round($"tfidf", 4).as("tfidf"))
  }

  val tfidfTopTermsOracle: String =
    s"""WITH w AS (SELECT doc_id,
       |    unnest(list_filter(string_split_regex(text, '${"\\"}s+'), x -> x <> '')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |scored AS (SELECT doc_id, term, tf, tf * ln(CAST(n AS DOUBLE) / df) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (SELECT doc_id, term, tf, tfidf,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
       |  FROM scored)
       |SELECT doc_id, term, tf, CAST(rank AS INT) AS rank,
       | round(tfidf, 4) AS tfidf
       |FROM ranked WHERE rank <= $TfidfTopK""".stripMargin
}
