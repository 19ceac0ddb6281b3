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
    * The closure emits raw integer sums; the 4dp mean is computed as
    * INTEGER round-half-up of the true rational —
    * `floor((sum·20000 + n) / (2n)) / 10000` — because rounding the
    * double `sum/n` is a knife edge: Spark rounds the exact binary value
    * via BigDecimal HALF_UP while DuckDB rounds a scaled double, and at
    * sf1 two of 50k payloads landed on an x.x1245 half-boundary where the
    * two disagree by one ulp of the 4th decimal. Integer division of
    * identical integers is identical everywhere; the twin
    * ([[extractFeaturesOracle]], byte values recovered in DuckDB from the
    * hex expansion of the blob) uses the same formula. */
  def extractFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    binaryTable(s, d)
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          var sum = 0L
          var i = 0
          while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
          (id, sum, payload.length, FakeCodec.sampleFrames(payload, 32).length)
        }
      }
      .toDF("doc_id", "byte_sum", "byte_len", "n_frames")
      .select($"doc_id",
        when($"byte_len" === 0, 0.0)
          .otherwise(
            expr("(byte_sum * 20000 + byte_len) div (byte_len * 2)") / 10000.0)
          .as("mean_byte"),
        $"n_frames")
  }

  /** Resize stage: nearest-neighbor downsample of every payload to
    * [[ResizeTarget]] bytes (the image-resize shape: fixed output size,
    * deterministic source-index arithmetic), emitting the resized length
    * and byte sum so the external gate hash-verifies the exact bytes the
    * stub selected. Same per-partition batch pattern as [[decodeMeta]]. */
  val ResizeTarget = 256

  def resizePayloads(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    binaryTable(s, d)
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val out = FakeCodec.resize(payload, ResizeTarget)
          var sum = 0L
          var i = 0
          while (i < out.length) { sum += out(i) & 0xff; i += 1 }
          (id, out.length, sum)
        }
      }
      .toDF("doc_id", "out_len", "out_sum")
  }

  /** Frame-sampling stride: one frame marker per 32 payload bytes. */
  val FrameStride = 32

  /** Frame-sample stage as its own query: materialize the SAMPLED frames
    * (every [[FrameStride]]-th byte via [[FakeCodec.sampleFrames]] — the
    * video keyframe-extraction shape: fixed stride, deterministic
    * positions) and emit count + byte sum so the external gate
    * hash-verifies the exact bytes the sampler selected — not just how
    * many ([[extractFeatures]] already counts frames; this pins WHICH).
    * Same per-partition batch pattern as [[decodeMeta]]; map-only, no
    * shuffle. A real decoder replaces [[FakeCodec.sampleFrames]] with
    * keyframe extraction and the plumbing — binary in, binary frames
    * out, per-partition codec amortization — is unchanged. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    binaryTable(s, d)
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val frames = FakeCodec.sampleFrames(payload, FrameStride)
          var sum = 0L
          var i = 0
          while (i < frames.length) { sum += frames(i) & 0xff; i += 1 }
          (id, frames.length, sum)
        }
      }
      .toDF("doc_id", "n_frames", "frame_sum")
  }

  // -------------------------------------------------- perceptual-hash dedup
  /** Byte shingle width for the perceptual-hash signature. */
  val PhashShingle = 4

  /** Perceptual-hash signatures: 64-bit SimHash over the [[PhashShingle]]-
    * byte shingles of each RESIZED payload ([[FakeCodec.resize]] to
    * [[ResizeTarget]] bytes first — pHash operates on a normalized image,
    * so two byte-identical-after-resize payloads collide and small payload
    * edits move few bits). With a real codec the resize becomes a DCT
    * low-band extraction; the signature/banding machinery is unchanged. */
  def phashSignatures(s: SparkSession, d: String): DataFrame =
    phashSignaturesOf(binaryTable(s, d))

  /** [[phashSignatures]] over an arbitrary (doc_id, payload) frame. */
  private[graft] def phashSignaturesOf(bin: DataFrame): DataFrame = {
    val s = bin.sparkSession
    import s.implicits._
    bin
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val rz = FakeCodec.resize(payload, ResizeTarget)
          (id, graft.functions.Hashing.simhash64ByteGrams(rz, PhashShingle))
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** Near-duplicate IMAGE pairs by perceptual hash — the image-dedup
    * stage of a multimodal pipeline (exact byte dedup misses re-encoded /
    * slightly-edited copies; pHash banding catches them). Candidate
    * generation and verification reuse [[graft.operators.Dedup]]'s
    * simhash machinery wholesale: DISTINCT-signature 4×16-bit band
    * equi-join with the saturated-bucket cap, Hamming ≤ 6, plus
    * equal-signature pairs at hamming 0 — so every scale guard measured
    * for text simhash (identical-cluster boundedness, hot-bucket
    * exclusion) applies unchanged here. */
  def phashPairs(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.simhashPairsOf(phashSignatures(s, d))

  /** DuckDB twin of [[phashPairs]]: resized bytes via the hex expansion
    * ([[resizePayloadsOracle]]'s index arithmetic), FNV-1a 64 per 4-byte
    * shingle (the HUGEINT mod-2^64 fold verified bit-equal to
    * [[graft.functions.Hashing.fnv1a64Bytes]]), bit-majority signature,
    * then [[graft.operators.Dedup.simhashBandTailSql]] verbatim. */
  val phashPairsOracle: String = {
    val U = "CAST(18446744073709551616 AS HUGEINT)" // 2^64
    s"""WITH t AS (SELECT doc_id, hex(encode(text)) AS h,
       |            octet_length(encode(text)) AS n FROM documents),
       |rz AS (SELECT doc_id, CASE WHEN n <= $ResizeTarget THEN
       |    list_transform(range(n), i ->
       |      CAST((strpos('0123456789ABCDEF', h[2*i+1]) - 1) * 16
       |         + (strpos('0123456789ABCDEF', h[2*i+2]) - 1) AS HUGEINT))
       |  ELSE
       |    list_transform(range($ResizeTarget), i ->
       |      CAST((strpos('0123456789ABCDEF', h[2*((i*n)//$ResizeTarget)+1]) - 1) * 16
       |         + (strpos('0123456789ABCDEF', h[2*((i*n)//$ResizeTarget)+2]) - 1) AS HUGEINT))
       |  END AS bs FROM t),
       |gh AS (SELECT doc_id, list_transform(range(len(bs) - ${PhashShingle - 1}), p ->
       |    list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |        [bs[p+1], bs[p+2], bs[p+3], bs[p+4]]),
       |      (x, c) -> ((x - (x % 256) + xor(CAST(x % 256 AS BIGINT), CAST(c AS BIGINT)))
       |                 * 1099511628211) % $U)) AS hs
       |  FROM rz WHERE len(bs) >= $PhashShingle),
       |-- majority vote per bit via native BIGINT shifts over the
       |-- unnested shingle hashes, not a per-bit list_filter lambda
       |-- (64 interpreted list scans per doc cost ~13 s at sf0.01; the
       |-- unnest+group form is sub-second). Bit j of the signed
       |-- two's-complement form equals bit j of the unsigned value.
       |hx AS MATERIALIZED (SELECT doc_id, CAST(CASE
       |    WHEN x >= CAST(9223372036854775808 AS HUGEINT) THEN x - $U
       |    ELSE x END AS BIGINT) AS xs
       |  FROM (SELECT doc_id, unnest(hs) AS x FROM gh)),
       |hn AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
       |bc AS (SELECT doc_id, t.j, sum((xs >> CAST(t.j AS INT)) & 1) AS c
       |  FROM hx, unnest(range(64)) AS t(j) GROUP BY doc_id, t.j),
       |sigs AS (SELECT bc.doc_id,
       |    CAST(sum(CASE WHEN 2 * bc.c > hn.n
       |      THEN (1::HUGEINT << CAST(bc.j AS INT)) ELSE 0::HUGEINT END)
       |      AS HUGEINT) AS sig
       |  FROM bc JOIN hn USING (doc_id) GROUP BY bc.doc_id),
       |sh AS MATERIALIZED (SELECT d.doc_id, coalesce(s.sig, 0::HUGEINT) AS sig
       |       FROM documents d LEFT JOIN sigs s USING (doc_id)),
       |""".stripMargin + graft.operators.Dedup.simhashBandTailSql
  }

  /** DuckDB twin of [[frameSample]]: the sampled positions are
    * 0, 32, 64, … (each group's head byte), recovered from the hex
    * expansion like [[resizePayloadsOracle]]. */
  val frameSampleOracle: String =
    s"""WITH t AS (SELECT doc_id, hex(encode(text)) AS h,
       |                  octet_length(encode(text)) AS n FROM documents)
       |SELECT doc_id,
       | CAST(ceil(n / $FrameStride.0) AS INT) AS n_frames,
       | CAST(coalesce(list_sum(list_transform(range(CAST(ceil(n / $FrameStride.0) AS BIGINT)),
       |   i -> (strpos('0123456789ABCDEF', h[2*(i*$FrameStride)+1]) - 1) * 16 +
       |        (strpos('0123456789ABCDEF', h[2*(i*$FrameStride)+2]) - 1))), 0)
       |   AS BIGINT) AS frame_sum
       |FROM t""".stripMargin

  /** DuckDB twin of [[resizePayloads]]: the nearest-neighbor source index
    * is integer arithmetic, the byte values come from the hex expansion. */
  val resizePayloadsOracle: String =
    """WITH t AS (SELECT doc_id, hex(encode(text)) AS h,
      |                  octet_length(encode(text)) AS n FROM documents)
      |SELECT doc_id,
      | CAST(CASE WHEN n <= 256 THEN n ELSE 256 END AS INT) AS out_len,
      | CAST(coalesce(CASE WHEN n <= 256 THEN
      |   list_sum(list_transform(range(n), i ->
      |     (strpos('0123456789ABCDEF', h[2*i+1]) - 1) * 16 +
      |     (strpos('0123456789ABCDEF', h[2*i+2]) - 1)))
      | ELSE
      |   list_sum(list_transform(range(256), i ->
      |     (strpos('0123456789ABCDEF', h[2*((i*n)//256)+1]) - 1) * 16 +
      |     (strpos('0123456789ABCDEF', h[2*((i*n)//256)+2]) - 1)))
      | END, 0) AS BIGINT) AS out_sum
      |FROM t""".stripMargin

  /** DuckDB equivalent of [[extractFeatures]]: byte values come from the
    * hex expansion of the UTF-8 blob (two nibbles per byte via strpos on
    * the hex alphabet) — pure SQL, no codec. */
  val extractFeaturesOracle: String =
    """WITH t AS (SELECT doc_id, hex(encode(text)) AS h,
      |                  octet_length(encode(text)) AS n FROM documents)
      |SELECT doc_id,
      | CASE WHEN n = 0 THEN 0.0 ELSE
      |   CAST((CAST(list_sum(list_transform(range(n), i ->
      |     (strpos('0123456789ABCDEF', h[2*i+1]) - 1) * 16 +
      |     (strpos('0123456789ABCDEF', h[2*i+2]) - 1))) AS BIGINT)
      |     * 20000 + n) // (2 * n) AS BIGINT) / 10000.0 END AS mean_byte,
      | CAST(ceil(n / 32.0) AS INT) AS n_frames
      |FROM t""".stripMargin

  val decodeMetaOracle: String =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      | CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
      | CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height
      |FROM documents""".stripMargin

  /** Byte-exact asset keeper catalog: md5 over the BINARY column (never
    * a string cast), keep-first keeper and copy count per digest —
    * [[graft.operators.Dedup.exactDedup]]'s contract lifted to the
    * multimodal table, where identical assets re-ingested under
    * different ids are the norm (mirrors, re-uploads, retries) and
    * near-dup ([[phashPairs]]) is the SECOND pass after byte-exact
    * collapse. Every digest is emitted (`is_dup` marks the collapsed
    * ones) so the catalog is the admission table an ingest batch
    * anti-joins against — and the gate row set is non-empty on a
    * dup-free corpus, where a duplicates-only report would pass
    * vacuously. The sf1 rehearsal corpus plants a 1,000-copy identical
    * cluster, exercising the collapse for real.
    *
    * Scale shape: map-side digest projection (payload never shuffles —
    * only the 16-byte digest and the id), one digest-keyed
    * map-side-combined aggregate. */
  def exactDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    binaryTable(s, d)
      .select($"doc_id", md5($"payload").as("digest"),
        length($"payload").cast("long").as("payload_bytes"))
      .groupBy($"digest")
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper_id"),
        min($"payload_bytes").as("payload_bytes"))
      .withColumn("is_dup", $"n_copies" > 1)
  }

  /** DuckDB twin of [[exactDedup]] — the payload is the UTF-8 encoding
    * of `text`, so md5 over the blob equals DuckDB's md5 over the
    * VARCHAR's UTF-8 bytes; octet_length is the byte count. */
  val exactDedupOracle: String =
    """SELECT md5(text) AS digest, CAST(count(*) AS BIGINT) AS n_copies,
      |  min(doc_id) AS keeper_id,
      |  CAST(min(octet_length(encode(text))) AS BIGINT) AS payload_bytes,
      |  count(*) > 1 AS is_dup
      |FROM documents GROUP BY md5(text)""".stripMargin
}
