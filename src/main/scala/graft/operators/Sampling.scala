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
}
