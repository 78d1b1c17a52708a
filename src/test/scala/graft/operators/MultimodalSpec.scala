package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._
import java.nio.file.Files

/** Multimodal plumbing + REAL imageio codec: binary+struct schema, parquet
  * round-trip, partition-preserving batch ops, actual PNG decode. */
class MultimodalSpec extends SparkSpec {
  import graft.TestSession.spark.implicits._

  private lazy val media = mediaFromDocuments(spark, sfDir)

  test("media table has binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val first = media.orderBy("media_id").head()
    assert(first.payload.nonEmpty && first.meta.kind == "image")
  }

  test("payloads are genuine PNGs/JPEGs the JDK can decode, routed by real magic bytes") {
    val items = media.orderBy("media_id").take(2)
    val (png, jpg) = (items(0), items(1)) // even id → PNG, odd → JPEG
    assert(png.payload.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    assert(png.meta.format == "image/png")
    assert((jpg.payload(0) & 0xff) == 0xff && (jpg.payload(1) & 0xff) == 0xd8,
      "odd-id payload is not a JPEG container")
    assert(jpg.meta.format == "image/jpeg")
    // probe dimensions come from an actual decode of BOTH containers,
    // matching the construction (8+id%8, 8+id%5)
    items.foreach { m =>
      val img = ImageCodec.decode(m.payload)
      assert(img.getWidth == m.meta.width && img.getHeight == m.meta.height)
      assert(m.meta.width == 8 + (m.media_id % 8).toInt)
      assert(m.meta.height == 8 + (m.media_id % 5).toInt)
    }
  }

  test("decoded channel means match the gradient construction in closed form (lossless half)") {
    // PNG encode → decode round trip must reproduce base + (W-1)/2 +
    // (H-1)/2 exactly — the q65 oracle's prediction
    media.filter(_.media_id % 2 == 0).orderBy("media_id").take(5).foreach { m =>
      val (r, g, b) = ImageCodec.channelMeans(m.payload)
      val (w, h) = (m.meta.width, m.meta.height)
      val expectedOffsetR = (w - 1) / 2.0 + (h - 1) / 2.0
      // base levels are whole ints; subtracting the offset must land on one
      val r0 = r - expectedOffsetR
      assert(r0 == r0.floor && r0 >= 0 && r0 <= 127, s"mean_r $r not on the gradient grid")
      assert((g - (w - 1) / 2.0).isWhole && (b - (h - 1) / 2.0).isWhole)
    }
  }

  test("JPEG round-trip moves channel means by less than the q94 tolerance, with margin") {
    // measure the ACTUAL worst-case mean deviation across the lossy half
    // against the TRUE md5-derived predictions (same closed form as the
    // q94 oracle); q94's within_tol = TRUE claim holds only while this
    // stays under JpegMeanTolerance — assert 2x margin so codec drift
    // fails here before it fails the driver hash-match
    val texts = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .as[(Long, String)].collect().toMap
    val worst = media.filter(_.media_id % 2 == 1).collect().map { m =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(texts(m.media_id).getBytes("UTF-8")).map("%02x".format(_)).mkString
      val (w, h, r0, g0, b0) = Multimodal.imageParams(m.media_id, md5)
      val (r, g, b) = ImageCodec.channelMeans(m.payload)
      val pr = r0 + (w - 1) / 2.0 + (h - 1) / 2.0
      val pg = g0 + (w - 1) / 2.0
      val pb = b0 + (h - 1) / 2.0
      math.max(math.abs(r - pr), math.max(math.abs(g - pg), math.abs(b - pb)))
    }.max
    info(f"true worst-case JPEG channel-mean deviation: $worst%.4f")
    assert(worst * 2 <= ImageCodec.JpegMeanTolerance,
      f"JPEG mean deviation $worst%.3f too close to tolerance ${ImageCodec.JpegMeanTolerance}")
  }

  test("binary + struct columns survive a parquet round-trip") {
    val dir = Files.createTempDirectory("graft_media").toString + "/media"
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[MediaItem]
    val a = media.orderBy("media_id").head()
    val b = back.orderBy("media_id").head()
    assert(java.util.Arrays.equals(a.payload, b.payload) && a.meta == b.meta)
    assert(back.count() == media.count())
  }

  test("feature extraction: fixed-dim float vectors, deterministic, narrow") {
    val feats = extractFeatures(media, dim = 8)
    val rows = feats.orderBy("media_id").take(3)
    assert(rows.forall(_.features.length == 8))
    // histogram is mass-normalized over real decoded pixels
    assert(rows.forall(r => math.abs(r.features.sum - 1.0f) < 1e-4))
    // deterministic: same input → same features
    val again = extractFeatures(media, dim = 8).orderBy("media_id").take(3)
    assert(rows.zip(again).forall { case (x, y) => x.features.sameElements(y.features) && x.checksum == y.checksum })
    // narrow: PAYLOADS never shuffle — no Exchange above the map that
    // decodes them. (The builder may round-robin the SMALL (id, text)
    // rows below the codec map to spread per-row decode work — guide-§8
    // shape: move lightweight rows once, generate heavy payloads after —
    // so the assertion scopes to the plan segment above the payload map.)
    val plan = extractFeatures(media, 8).queryExecution.executedPlan.toString
    val mapIdx = plan.indexOf("MapPartitions")
    assert(mapIdx >= 0, s"expected a MapPartitions operator:\n$plan")
    val aboveMap = plan.substring(0, mapIdx)
    assert(!aboveMap.contains("Exchange"),
      s"payloads must not cross a shuffle:\n$plan")
  }

  test("resize re-encodes a real image at the target dimensions") {
    val resized = resizeAll(media, 4, 4).orderBy("media_id").head()
    assert(resized.meta.width == 4 && resized.meta.height == 4)
    val img = ImageCodec.decode(resized.payload)
    assert(img.getWidth == 4 && img.getHeight == 4)
  }

  test("frame sampling crops real filmstrip frames") {
    val frames = sampleFrames(media, everyN = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame"))
    assert(frames.count() > media.count()) // more frames than items
    val f = frames.orderBy("media_id", "frame_idx").head()
    val img = ImageCodec.decode(f.getAs[Array[Byte]]("frame"))
    assert(img.getHeight == 4, "frame crop height")
  }

  test("extracted features feed the vector ops (array<float> contract)") {
    val feats = extractFeatures(media, dim = 8).toDF()
    assert(feats.schema("features").dataType.simpleString == "array<float>")
  }

  test("q232: perceptual clusters group byte-DISTINCT payloads (noise engaged)") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.q232ImagePhashDedup.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(out.length == n)
    // clusters are exactly the planted groups (members share the dhash,
    // rep is the group head) wherever the group is complete
    out.foreach { case (id, _, rep, csize) =>
      val g = id / Multimodal.PhashGroup
      assert(rep == g * Multimodal.PhashGroup, s"media $id clustered to rep $rep")
      val expectSize = math.min(n - g * Multimodal.PhashGroup, Multimodal.PhashGroup.toLong)
      assert(csize == expectSize)
    }
    // the planted noise must make group members byte-distinct — otherwise
    // this is just exact dedup wearing a costume
    val md5s = Multimodal.q232Payloads(spark, sfDir)
      .filter(r => r._1 < Multimodal.PhashGroup)
      .collect().map { case (_, payload) =>
        java.security.MessageDigest.getInstance("MD5").digest(payload).toSeq
      }
    assert(md5s.length == Multimodal.PhashGroup)
    assert(md5s.distinct.length == md5s.length,
      "group members must differ byte-wise (the noise is the point)")
  }
}
