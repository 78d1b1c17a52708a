package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._
import java.nio.file.Files

/** Multimodal plumbing: binary+struct schema, parquet round-trip,
  * partition-preserving batch ops, deterministic stub codec. */
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
    // deterministic: same input → same features
    val again = extractFeatures(media, dim = 8).orderBy("media_id").take(3)
    assert(rows.zip(again).forall { case (x, y) => x.features.sameElements(y.features) && x.checksum == y.checksum })
    // narrow: no shuffle in the plan (no Exchange before the map)
    val plan = extractFeatures(media, 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"feature extraction must not shuffle:\n$plan")
  }

  test("resize updates metadata and payload; frame sampling explodes rows") {
    val resized = resizeAll(media, 4, 4).orderBy("media_id").head()
    assert(resized.meta.width == 4 && resized.meta.height == 4 && resized.payload.length <= 16)
    val frames = sampleFrames(media, everyN = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame"))
    assert(frames.count() > media.count()) // more frames than items
  }

  test("extracted features feed the vector ops (array<float> contract)") {
    val feats = extractFeatures(media, dim = 8).toDF()
    assert(feats.schema("features").dataType.simpleString == "array<float>")
  }
}
