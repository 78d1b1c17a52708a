package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}

/** Multimodal column support — SURVEY.md §2.5 [X] (LLM: multimodal
  * columns). Media payloads are opaque `binary` columns with a typed
  * metadata struct; decode / feature-extract / resize / frame-sample are
  * batch operators over the binary payload.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): [[FakeCodec]] is a clearly-marked deterministic stand-in
  * that derives "dimensions" and "features" from the payload bytes. The
  * Spark-side plumbing — schema, parquet round-trip of binary+struct
  * columns, partition-preserving `mapPartitions` batch shape, feature
  * vectors as `array<float>` compatible with [[VectorOps]] — is real and
  * tested (MultimodalSpec). Swapping FakeCodec for a JNI/JavaCV decoder
  * changes one function, not the pipeline.
  *
  * Scale notes: payloads never pass through a shuffle — decode/extract are
  * narrow per-partition transforms; only the (small) extracted features and
  * metadata move. That is the invariant that matters at 100 TB of media.
  */
object Multimodal {

  /** Typed media row: binary payload + metadata struct. */
  final case class MediaMeta(kind: String, format: String, width: Int, height: Int, durationMs: Long)
  final case class MediaItem(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: String, features: Array[Float])

  /** STUB codec — deterministic fake in place of a real image/audio
    * decoder. Every derived value is a pure function of the payload bytes
    * so tests are stable anywhere. */
  object FakeCodec {
    /** "Decode" → metadata (a real impl reads the container header). */
    def probe(payload: Array[Byte], kind: String): MediaMeta = {
      val n = payload.length
      MediaMeta(kind, "fake/v1", width = 16 + (n % 64), height = 16 + (n % 48), durationMs = n.toLong)
    }
    /** "Feature-extract" → fixed-dim float vector (a real impl runs a
      * vision/audio model over decoded frames). Deterministic: bytes are
      * folded into `dim` accumulators. */
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < payload.length) { acc(i % dim) += (payload(i) & 0xff) / 255.0f; i += 1 }
      acc
    }
    /** "Resize" → payload for the scaled rendition (real impl re-encodes). */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      payload.take(math.max(1, math.min(payload.length, w * h)))
    /** "Frame-sample" → every nth chunk as a frame payload. */
    def frameSample(payload: Array[Byte], everyN: Int, frameBytes: Int = 32): Seq[Array[Byte]] =
      payload.grouped(frameBytes).zipWithIndex.collect { case (f, i) if i % everyN == 0 => f }.toSeq
  }

  /** Build a media table from `documents` (payload = utf8 bytes as the
    * deterministic stand-in blob). Real pipelines read binary files via
    * `spark.read.format("binaryFile")`. */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaItem] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        MediaItem(id, payload, FakeCodec.probe(payload, "image"))
      }
  }

  /** Batch feature extraction: partition-preserving mapPartitions (the
    * batch shape a vectorized/model-serving codec needs — amortize model
    * init per partition, stream rows through). */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 8): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition init happens HERE in a real codec (load model once)
      it.map { m =>
        MediaFeatures(m.media_id, m.payload.length.toLong,
          java.security.MessageDigest.getInstance("MD5").digest(m.payload)
            .map("%02x".format(_)).mkString,
          FakeCodec.features(m.payload, dim))
      }
    }
  }

  /** Resize rendition generation (narrow, no shuffle). */
  def resizeAll(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.map(m => m.copy(payload = FakeCodec.resize(m.payload, w, h),
      meta = m.meta.copy(width = w, height = h)))
  }

  /** Frame sampling: one row per sampled frame (flatMap — generator/UDTF
    * shape). */
  def sampleFrames(items: Dataset[MediaItem], everyN: Int): DataFrame = {
    import items.sparkSession.implicits._
    items.flatMap(m => FakeCodec.frameSample(m.payload, everyN).zipWithIndex.map {
      case (frame, idx) => (m.media_id, idx, frame)
    }).toDF("media_id", "frame_idx", "frame")
  }

  /** q34: the oracle-checkable slice of the binary path — byte length and
    * md5 checksum of the payload column (DuckDB sees the same utf8 bytes
    * via the text column). Everything downstream of the binary column is
    * engine-side only. */
  val q34BinaryPayload = QueryDef(
    "q34_binary_payload",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast(LongType).as("n_bytes"),
          md5(col("payload")).as("checksum"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
           |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |  md5(text) AS checksum
           |FROM documents ORDER BY doc_id""".stripMargin)
  )

  val all: Seq[QueryDef] = Seq(q34BinaryPayload)
}
