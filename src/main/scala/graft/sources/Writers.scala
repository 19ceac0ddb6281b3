package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, md5}

/** Output-layout utilities for engine results at scale.
  *
  * [[writeSortedClustered]] is the scalable replacement for the
  * reference's single sorted output file (`src/MapReduceMaster.java:
  * 449-478`): range-repartition on the sort key then sort within
  * partitions, so part files cover disjoint, globally ordered key ranges.
  * Consequences at 100 TB: no single-task sink bottleneck, and parquet
  * min/max footer stats per file line up with the key, so downstream
  * point/range reads prune whole files (verified in WritersSpec by
  * checking the ranges really are disjoint).
  */
object Writers {

  def writeSortedClustered(df: DataFrame, sortCols: Seq[String],
                           path: String, numPartitions: Int = 0): Unit = {
    val keyCols = sortCols.map(col)
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, keyCols: _*)
      else df.repartitionByRange(keyCols: _*)
    ranged.sortWithinPartitions(keyCols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** JSONL (newline-delimited JSON) round-trip of a document frame:
    * write with Spark's JSON sink, read back under the ORIGINAL schema.
    * JSONL is the interchange format LLM data pipelines actually live on
    * (crawl dumps, instruction sets, eval suites ship as .jsonl) — this
    * is the engine's evidence that the corpus survives the format
    * losslessly: escaping (quotes, backslashes, control chars), unicode,
    * and numeric types all verified by the oracle comparing the
    * round-tripped rows against the parquet originals.
    *
    * Scale shape: both legs are map-only distributed IO — executors
    * write/read line-delimited shards with no shuffle; JSONL's
    * one-record-per-line framing is what makes the format splittable and
    * therefore 100 TB-safe (a multi-line pretty-JSON sink would not
    * be). */
  private[graft] def jsonlRoundtripOf(docs: DataFrame, path: String): DataFrame = {
    docs.write.mode(SaveMode.Overwrite).json(path)
    docs.sparkSession.read.schema(docs.schema).json(path)
  }

  /** Gate query: round-trip the documents table through JSONL and emit a
    * content digest per row — hash-matched against the parquet originals
    * by the DuckDB oracle, so any escaping or type loss in either the
    * write or the read leg fails the gate. */
  def jsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = java.nio.file.Paths.get("target", "jsonl_rt",
      java.lang.Long.toHexString(System.nanoTime())).toString
    jsonlRoundtripOf(graft.core.Tables.documents(s, d), path)
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("lang"), col("source"), col("n_chars"))
  }

  /** DuckDB twin of [[jsonlRoundtrip]] — the originals; equality proves
    * the round trip lost nothing. */
  val jsonlRoundtripOracle: String =
    "SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars FROM documents"
}
