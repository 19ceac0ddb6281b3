package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / frame-sample stages.
  *
  * The decode step is STUBBED (no image/audio codecs in this container):
  * [[FakeCodec]] derives deterministic "dimensions" and "frames" from the
  * bytes themselves, so the Spark-side plumbing — binary schema, partition
  * behavior, per-partition batch processing, metadata structs — is real and
  * testable, and swapping in a true codec changes one function.
  *
  * Scale notes: payloads stay opaque binary end-to-end (never cast to
  * string, never collected); per-partition typed iteration (`mapPartitions`)
  * is the JVM analog of `mapInPandas` batch processing — amortizes codec
  * init across a partition, keeps memory bounded by one batch.
  */
object Multimodal {

  /** Deterministic fake codec — REPLACE with real decoders off-container. */
  object FakeCodec {
    /** "Decode" fake image dims from payload length (stub for e.g. JPEG
      * header parsing). */
    def dims(payload: Array[Byte]): (Int, Int) =
      (64 + payload.length % 512, 64 + (payload.length * 7) % 512)

    /** "Feature" stub: mean byte value — a real per-pixel reduction shape. */
    def meanByte(payload: Array[Byte]): Double =
      if (payload.isEmpty) 0.0
      else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length

    /** "Frame sampling" stub: every k-th byte as a frame marker. */
    def sampleFrames(payload: Array[Byte], k: Int): Array[Byte] =
      payload.grouped(k).map(_.head).toArray

    /** "Resize" stub: nearest-neighbor downsample of the payload to a
      * target length (stand-in for image resize; deterministic). */
    def resize(payload: Array[Byte], targetLen: Int): Array[Byte] = {
      if (payload.isEmpty || targetLen <= 0) Array.emptyByteArray
      else if (payload.length <= targetLen) payload
      else Array.tabulate(targetLen) { i =>
        payload((i.toLong * payload.length / targetLen).toInt)
      }
    }
  }

  /** Build a binary-payload table from documents (text bytes stand in for
    * image bytes) with a typed metadata struct — the ingestion shape. */
  def binaryTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(
      $"doc_id",
      encode($"text", "UTF-8").as("payload"),
      struct(lit("fake/v1").as("format"), $"source", $"lang").as("meta"))
  }

  /** Decode + feature-extract over the binary column, per-partition batches.
    * Output columns are arithmetic on byte length so the driver's DuckDB
    * oracle can verify the plumbing end-to-end. */
  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    binaryTable(s, d)
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // codec init would happen once per partition here
        rows.map { case (id, payload) =>
          val (w, h) = FakeCodec.dims(payload)
          (id, payload.length.toLong, w, h)
        }
      }
      .toDF("doc_id", "byte_len", "width", "height")
  }

  /** Feature-extraction stage over the binary column: per-payload mean
    * byte (the per-pixel-reduction shape) and frame count at a fixed
    * sampling stride — same per-partition batch pattern as [[decodeMeta]].
    * Not SQL-expressible over blobs → rows-only; TextSpec re-computes the
    * features in-JVM and asserts equality. */
  def extractFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    binaryTable(s, d)
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val mean = BigDecimal(FakeCodec.meanByte(payload))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, mean, FakeCodec.sampleFrames(payload, 32).length)
        }
      }
      .toDF("doc_id", "mean_byte", "n_frames")
  }

  val decodeMetaOracle: String =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      | CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
      | CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height
      |FROM documents""".stripMargin
}
