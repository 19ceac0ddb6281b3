package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Dataset curation operators: deterministic sampling and reproducible
  * shard/order assignment for training runs.
  *
  * Both use content hashes as the randomness source instead of `rand()`:
  * the "sample" is then a pure function of the data — re-runnable,
  * oracle-checkable, and stable across cluster sizes and retries (a
  * rand()-based sample is none of those). This is the standard trick for
  * reproducible training-data pipelines.
  */
object Sampling {

  /** Stratified deterministic sample: the k documents with the smallest
    * md5(text) per language — proportional coverage of every stratum,
    * stable under re-partitioning. */
  def stratifiedSample(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy(md5($"text").asc, $"doc_id".asc)
    Tables.documents(s, d)
      .withColumn("pick", row_number().over(w))
      .filter($"pick" <= k)
      .select($"lang", $"doc_id", $"pick")
  }

  val stratifiedSampleOracle: String =
    """SELECT lang, doc_id, pick FROM (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang ORDER BY md5(text) ASC, doc_id ASC) AS pick
      |  FROM documents) t
      |WHERE pick <= 10""".stripMargin

  /** Reproducible training shards: content-hash-ordered position within a
    * doc_id-modulo shard. Consuming shards in (shard, pos) order gives a
    * deterministic global "shuffle" of the corpus — same order on every
    * rerun, any cluster size. */
  def trainShards(s: SparkSession, d: String, shards: Int = 8): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"shard").orderBy(md5($"text").asc, $"doc_id".asc)
    Tables.documents(s, d)
      .withColumn("shard", ($"doc_id" % shards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select($"doc_id", $"shard", $"pos")
  }

  val trainShardsOracle: String =
    """SELECT doc_id, shard, pos FROM (
      |  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
      |    row_number() OVER (PARTITION BY doc_id % 8
      |                       ORDER BY md5(text) ASC, doc_id ASC) AS pos
      |  FROM documents) t""".stripMargin

  /** The whole curation pipeline composed end to end — what a training-data
    * job actually runs: quality-filter (score >= 0.5) ∘ near-dup keep-list
    * ∘ deterministic shard+position assignment. Every stage is one of the
    * already-verified operators; the composition itself is what this query
    * verifies (the oracle recomputes all three stages in SQL). Shard
    * positions are assigned AFTER filtering, so shards stay dense.
    *
    * Scale note: the position window sorts per shard, so `shards` must
    * grow with the corpus (rule of thumb: one shard per few GB — the
    * default 8 is the test-scale setting, the parameter is the knob). The
    * keep-list join broadcasts only cluster members; quality joins are
    * co-partitioned on doc_id. */
  def curationPipeline(s: SparkSession, d: String, shards: Int = 8): DataFrame = {
    import s.implicits._
    val quality = TextOps.qualityScore(s, d).select($"doc_id", $"quality_score")
    val keep = Dedup.keepList(s, d).filter($"keep").select($"doc_id")
    val kept = Tables.documents(s, d)
      .join(keep, "doc_id")
      .join(quality, "doc_id")
      .filter($"quality_score" >= 0.5)
    val w = Window.partitionBy($"shard").orderBy(md5($"text").asc, $"doc_id".asc)
    kept
      .withColumn("shard", ($"doc_id" % shards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select($"doc_id", $"quality_score", $"shard", $"pos")
  }

  // closure fragments come from Dedup (one copy of the pair/closure
  // semantics); the quality formula mirrors TextOps.qualityScore — an SQL
  // fragment shared with qualityScoreOracle would need its CTE names
  // parameterized, so the formula is asserted equal by the gate instead
  val curationPipelineOracle: String =
    s"""WITH RECURSIVE ${Dedup.closureCtes},
       |${Dedup.clustersCte},
       |q AS (SELECT doc_id, text,
       |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_toks,
       |    len(list_filter(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
       |        x -> x IN ('the','a','of','and','to','in','is','it'))) AS n_stop,
       |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
       |  FROM documents),
       |scored AS (SELECT doc_id, text,
       |    round(least(1.0, n_toks / 100.0) * 0.5
       |      + (n_stop / CAST(n_toks AS DOUBLE)) * 0.3
       |      + (1.0 - n_punct / CAST(length(text) AS DOUBLE)) * 0.2, 4) AS quality_score
       |  FROM q),
       |kept AS (
       |  SELECT s.doc_id, s.text, s.quality_score
       |  FROM scored s LEFT JOIN clusters c ON s.doc_id = c.doc_id
       |  WHERE coalesce(c.cluster, s.doc_id) = s.doc_id
       |    AND s.quality_score >= 0.5)
       |SELECT doc_id, quality_score, CAST(doc_id % 8 AS INTEGER) AS shard,
       |  row_number() OVER (PARTITION BY doc_id % 8
       |                     ORDER BY md5(text) ASC, doc_id ASC) AS pos
       |FROM kept""".stripMargin
}
