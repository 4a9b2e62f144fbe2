package graft

import graft.media.Media
import graft.media.Media.{MediaFeatures, MediaRecord}
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Media.syntheticMedia(
    Tables.load(spark, "/root/testdata/sf0.001", "documents"))

  test("syntheticMedia: binary payload with typed metadata per doc") {
    val rows = media.limit(5).collect()
    assert(rows.nonEmpty)
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(Set("image", "audio", "video").contains(rows.head.getAs[String]("kind")))
  }

  test("extractFeatures: batched partition decode is deterministic and total") {
    val ds = media.as[MediaRecord]
    val features = Media.extractFeatures(ds, batchSize = 32).cache()
    assert(features.count() === media.count())
    // fingerprint matches an independent md5 of the same payload
    val expected = media
      .select(col("media_id"), substring(md5(col("payload")), 1, 16).as("fp"))
      .as[(Long, String)].collect().toMap
    val got = features.select(col("media_id"), col("fingerprint"))
      .as[(Long, String)].collect().toMap
    assert(got === expected)
    // stub decode honors the per-kind contract
    val img = features.filter(col("kind") === "image").as[MediaFeatures].head()
    assert(img.width === (img.n_bytes % 640 + 1).toInt)
    assert(img.n_frames === 1)
  }

  test("resize: fits the box, never upscales, shrinks payload, deterministic") {
    val resized = Media.resize(media.as[MediaRecord], maxW = 128, maxH = 96)
    val before = media.as[MediaRecord].collect().map(r => r.media_id -> r).toMap
    resized.collect().foreach { r =>
      val orig = before(r.media_id)
      if (orig.kind == "audio") {
        // zero-dim records pass through untouched
        assert(r.payload.length === orig.payload.length)
      } else {
        assert(r.declared_w <= 128 && r.declared_h <= 96, r.media_id)
        assert(r.declared_w >= 1 && r.declared_h >= 1, r.media_id)
        assert(r.payload.length <= orig.payload.length, "resize must never grow a payload")
        // aspect preserved within floor rounding: w/h ratio drift < 1 unit step
        val (w0, h0, _) = Media.decodeStub(orig.kind, orig.payload)
        if (w0 <= 128 && h0 <= 96)
          assert(r.declared_w === w0 && r.declared_h === h0, "no upscale / no-op inside the box")
      }
    }
    // deterministic: second run bit-identical
    val again = Media.resize(media.as[MediaRecord], maxW = 128, maxH = 96)
      .collect().map(r => r.media_id -> r.payload.toSeq).toMap
    resized.collect().foreach(r => assert(again(r.media_id) === r.payload.toSeq))
  }

  test("sampleFrames: every k-th frame of video payloads") {
    val features = Media.extractFeatures(media.as[MediaRecord])
    val frames = Media.sampleFrames(features, everyK = 10)
    val one = features.filter(col("kind") === "video").as[MediaFeatures].head()
    val expected = (0 until one.n_frames by 10).toSeq
    val got = frames.filter(col("media_id") === one.media_id)
      .orderBy("frame_idx").select("frame_idx").as[Int].collect().toSeq
    assert(got === expected)
  }
}
