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
    * formula). The normalizer is the scalar-subquery shape used by
    * [[tfidfTopTerms]]/[[lmBits]]: `crossJoin(broadcast(1-row sum))` over
    * the |sources|-row aggregate. (An earlier form wrote
    * `Window.partitionBy(lit(1))` — Catalyst folds the constant away,
    * leaving an EMPTY partition spec, and WindowExec moves everything to
    * one partition at runtime. Bounded here (20 rows), but it was the one
    * single-partition Window node in the suite, and the census now flags
    * the whole class — see PlanWalk's `singlePartWindow`.) */
  val MixAlpha = 0.7

  def mixWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bySource = Tables.documents(s, d)
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w_raw", pow($"n_docs", MixAlpha))
    val total = bySource.agg(sum($"w_raw").as("w_total"))
    bySource.crossJoin(broadcast(total))
      .withColumn("weight", round($"w_raw" / $"w_total", 6))
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

  /** Unigram-LM perplexity score (the CCNet perplexity-filter shape, but
    * corpus-internal so it needs no external model file): train an
    * add-one-smoothed unigram LM on the corpus itself — p(w) = (c(w)+1) /
    * (N+V) — and score each document by its mean negative log2 token
    * probability (bits/token). Boilerplate-heavy docs score low,
    * rare-token soup scores high; a perplexity filter cuts both tails.
    * Documents with zero tokens have no defined score and are omitted
    * (the consumer's emptiness policy, as with [[Sampling.packSequences]]).
    *
    * Shape: explode → vocabulary count (two-phase) → word join back (the
    * vocabulary is corpus-proportional — no broadcast hint, AQE sizes it,
    * and hot words like stop-words are exactly the skew-join-split case
    * rehearsed in SCALE_r5.md) → per-doc aggregate. N and V ride one
    * broadcast single-row aggregate (the scalar-subquery shape).
    * Float note: the per-doc sum of logs associates differently in DuckDB
    * than in Spark's partial aggregation; bounded by ulps and absorbed by
    * the shared 4dp rounding, like every double aggregate oracle here. */
  def lmBits(s: SparkSession, d: String): DataFrame =
    lmBitsOf(Tables.documents(s, d))

  private[graft] def lmBitsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val words = docs.select($"doc_id",
      explode(expr("filter(split(text, '\\\\s+'), x -> x <> '')")).as("word"))
    val c = words.groupBy($"word").agg(count(lit(1)).as("c"))
    val nv = c.agg(sum($"c").cast("double").as("n_total"),
      count(lit(1)).cast("double").as("v_total"))
    words.join(c, "word").crossJoin(broadcast(nv))
      .withColumn("bits", -log(2.0, ($"c" + 1) / ($"n_total" + $"v_total")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum($"bits") / count(lit(1)), 4).as("bits_per_token"))
  }

  /** DuckDB twin of [[lmBits]] — ln(x)/ln(2) mirrors Spark's
    * `log(base, x)` evaluation shape. */
  val lmBitsOracle: String =
    """WITH tok AS (SELECT doc_id,
      |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS word
      |  FROM documents),
      |c AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
      |t AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total,
      |             CAST(count(*) AS DOUBLE) AS v_total FROM c)
      |SELECT tok.doc_id, count(*) AS n_tokens,
      |  round(sum(-(ln((c.c + 1) / (t.n_total + t.v_total)) / ln(2))) / count(*), 4)
      |    AS bits_per_token
      |FROM tok JOIN c USING (word) CROSS JOIN t
      |GROUP BY tok.doc_id""".stripMargin

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
