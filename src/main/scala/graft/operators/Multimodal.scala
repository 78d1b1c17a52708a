package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column support — SURVEY.md §2.5 [X] (LLM: multimodal
  * columns). Media payloads are opaque `binary` columns with a typed
  * metadata struct; decode / feature-extract / resize / frame-sample are
  * batch operators over the binary payload.
  *
  * The codec is REAL: [[ImageCodec]] encodes and decodes PNG through the
  * JDK's `javax.imageio` (no external dependency) — `probe` parses the
  * actual container header, `channelMeans`/`features` run over decoded
  * pixels, `resize` re-renders through Graphics2D and re-encodes, and
  * `frameSample` crops filmstrip frames as real sub-images. Only
  * video/audio containers remain out of scope (no codecs ship in the
  * JDK); their pipeline shape is the same filmstrip path.
  *
  * The test images are generated deterministically from the documents
  * table (dimensions from doc_id, a per-channel gradient seeded by
  * md5(text)), which makes the DECODED pixel statistics predictable in
  * closed form — so q65 puts the real decode path under the DuckDB
  * oracle: any decode defect shifts the empirical channel means away from
  * the oracle's prediction and fails the hash compare.
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
  final case class MediaStats(doc_id: Long, width: Long, height: Long,
                              mean_r: Double, mean_g: Double, mean_b: Double)

  /** Real PNG codec over `javax.imageio` — pure JDK. */
  object ImageCodec {
    ImageIO.setUseCache(false) // no disk-backed stream cache inside executors

    /** Encode a W×H RGB image, pixel colors from `rgb(x, y)`. */
    def encodePng(width: Int, height: Int)(rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (r, g, b) = rgb(x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def decode(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }

    /** Parse the real container: dimensions from the decoded image. */
    def probe(payload: Array[Byte], kind: String): MediaMeta = {
      val img = decode(payload)
      MediaMeta(kind, "image/png", img.getWidth, img.getHeight, durationMs = 0L)
    }

    /** Empirical per-channel means over the decoded pixels. */
    def channelMeans(payload: Array[Byte]): (Double, Double, Double) = {
      val img = decode(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w * h).toDouble
      (sr / n, sg / n, sb / n)
    }

    /** Feature vector from decoded pixels: a `dim`-bin luminance histogram
      * (mass-normalized) — the shape a real embedding model's output takes
      * (fixed-dim float array, [[graft.operators.VectorOps]]-compatible). */
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val img = decode(payload)
      val acc = new Array[Float](dim)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val lum = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
          acc(lum * dim / 256) += 1.0f
          x += 1
        }
        y += 1
      }
      val n = (w * h).toFloat
      acc.map(_ / n)
    }

    /** Real resize: render into a W×H canvas and re-encode. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = decode(payload)
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      try g2.drawImage(src, 0, 0, w, h, null) finally g2.dispose()
      val out = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", out)
      out.toByteArray
    }

    /** Filmstrip frame sampling: the image is a vertical stack of
      * `frameHeight`-row frames; crop every `everyN`-th as its own image.
      * (The decode-crop-reencode shape video frame extraction uses; the
      * JDK ships no video codecs, so stills stand in for frames.) */
    def frameSample(payload: Array[Byte], everyN: Int, frameHeight: Int = 4): Seq[Array[Byte]] = {
      val src = decode(payload)
      val nFrames = src.getHeight / frameHeight
      (0 until nFrames).collect {
        case i if i % everyN == 0 =>
          val sub = src.getSubimage(0, i * frameHeight, src.getWidth, frameHeight)
          val out = new ByteArrayOutputStream()
          ImageIO.write(sub, "png", out)
          out.toByteArray
      }
    }
  }

  /** Deterministic image parameters for doc `id` with text-digest `hex`
    * (md5 hex string): dimensions from the id, per-channel base levels
    * from the first three digest bytes (masked to ≤127 so the `+x+y`
    * gradient never wraps: 127 + 14 + 11 < 256). Shared by the builder
    * and the spec; the q65 oracle reproduces the same closed form in SQL. */
  private[operators] def imageParams(id: Long, hex: String): (Int, Int, Int, Int, Int) = {
    val w = 8 + (id % 8).toInt
    val h = 8 + (id % 5).toInt
    def byteAt(i: Int) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16) & 0x7f
    (w, h, byteAt(0), byteAt(1), byteAt(2))
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Build a media table of REAL PNGs from `documents`: doc i becomes a
    * (8+i%8)×(8+i%5) image whose channel gradients are seeded by
    * md5(text). Real pipelines read binary files via
    * `spark.read.format("binaryFile")`; the generated corpus exists so
    * decode correctness is oracle-checkable (q65). */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaItem] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val (w, h, r0, g0, b0) = imageParams(id, md5hex(text.getBytes("UTF-8")))
        val payload = ImageCodec.encodePng(w, h)((x, y) => (r0 + x + y, g0 + x, b0 + y))
        MediaItem(id, payload, ImageCodec.probe(payload, "image"))
      }
  }

  /** Batch feature extraction: partition-preserving mapPartitions (the
    * batch shape a vectorized/model-serving codec needs — amortize codec
    * init per partition, stream rows through). */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 8): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition init happens HERE (imageio registry, model load)
      it.map { m =>
        MediaFeatures(m.media_id, m.payload.length.toLong,
          md5hex(m.payload), ImageCodec.features(m.payload, dim))
      }
    }
  }

  /** Resize rendition generation (narrow, no shuffle, real re-encode). */
  def resizeAll(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.map(m => m.copy(payload = ImageCodec.resize(m.payload, w, h),
      meta = m.meta.copy(width = w, height = h)))
  }

  /** Frame sampling: one row per sampled frame (flatMap — generator/UDTF
    * shape). */
  def sampleFrames(items: Dataset[MediaItem], everyN: Int): DataFrame = {
    import items.sparkSession.implicits._
    items.flatMap(m => ImageCodec.frameSample(m.payload, everyN).zipWithIndex.map {
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

  /** q65: the REAL decode path under the oracle. Spark encodes a PNG per
    * document, then DECODES it with `javax.imageio` and measures the
    * empirical per-channel pixel means; DuckDB predicts those means in
    * closed form from md5(text) and the gradient construction
    * (mean over x,y of base+x+y = base + (W-1)/2 + (H-1)/2 — all dyadic
    * rationals, so both engines' doubles are exact and the hash compare is
    * bit-for-bit). A wrong decode — channel order, row stride, color
    * model — shifts the empirical means and fails the match. */
  val q65ImageDecode = QueryDef(
    "q65_image_decode",
    (s, d) => {
      import s.implicits._
      mediaFromDocuments(s, d)
        .mapPartitions(_.map { m =>
          val (r, g, b) = ImageCodec.channelMeans(m.payload)
          MediaStats(m.media_id, m.meta.width.toLong, m.meta.height.toLong, r, g, b)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(8 + doc_id % 8 AS BIGINT) AS width,
           |  CAST(8 + doc_id % 5 AS BIGINT) AS height,
           |  (CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) & 127)
           |    + (8 + doc_id % 8 - 1) / 2.0 + (8 + doc_id % 5 - 1) / 2.0 AS mean_r,
           |  (CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT) & 127)
           |    + (8 + doc_id % 8 - 1) / 2.0 AS mean_g,
           |  (CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT) & 127)
           |    + (8 + doc_id % 5 - 1) / 2.0 AS mean_b
           |FROM documents ORDER BY doc_id""".stripMargin)
  )

  val all: Seq[QueryDef] = Seq(q34BinaryPayload, q65ImageDecode)
}
