package graft.media

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads plus
  * typed metadata, with decode/feature-extraction staged per partition in
  * size-bounded batches — the Spark-side shape a real image/audio decode
  * would use. The decode itself is a clearly marked deterministic STUB
  * (no media codecs in this container); everything around it — schema,
  * partitioning, batch grouping, output contract — is real and tested.
  */
object Media {

  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte],
      declared_w: Int, declared_h: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, fingerprint: String,
      width: Int, height: Int, n_frames: Int)

  /** Manufacture binary payloads from the documents table (utf-8 text
    * bytes standing in for image/audio blobs) with deterministic typed
    * metadata — lets the pipeline run on the driver testdata.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "utf-8").as("payload"),
      (col("n_chars") % 640).cast("int").as("declared_w"),
      (col("n_chars") % 480).cast("int").as("declared_h"))

  /** STUB — stands in for a real codec (PIL/ffmpeg-class library, absent
    * here). Deterministic over the payload bytes so tests are exact.
    * A production build swaps only this function.
    */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    kind match {
      case "image" => (n % 640 + 1, n % 480 + 1, 1)
      case "audio" => (0, 0, n % 1000 + 1)       // "frames" = samples
      case _       => (n % 320 + 1, n % 240 + 1, n % 120 + 1)
    }
  }

  /** Per-partition, size-bounded batch decode (the mapPartitions +
    * grouped(batchSize) shape a vectorized decode kernel needs).
    */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real kernel would decode `batch` as one vectorized call
        batch.iterator.map { r =>
          val (w, h, frames) = decodeStub(r.kind, r.payload)
          val fp = java.security.MessageDigest.getInstance("MD5")
            .digest(r.payload).map("%02x".format(_)).mkString.take(16)
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, fp, w, h, frames)
        }
      }
    }
  }

  /** Deterministic frame sampling for "video" payloads: every k-th frame
    * index up to the decoded frame count.
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int = 10): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .select(
        col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))

  /** STUB resize kernel — aspect-preserving downscale to fit
    * (maxW, maxH), never upscaling: scale = min(maxW/w, maxH/h, 1).
    * The "resized pixels" are a deterministic byte-prefix of the
    * payload sized by the area ratio; a production build swaps only
    * this function for the real resampler. All arithmetic is plain
    * IEEE double so an oracle can replay the metadata contract.
    */
  def resizeStub(
      kind: String, payload: Array[Byte], maxW: Int, maxH: Int): (Array[Byte], Int, Int) = {
    val (w, h, _) = decodeStub(kind, payload)
    if (w <= 0 || h <= 0) (payload, w, h)
    else {
      val scale = math.min(math.min(maxW.toDouble / w, maxH.toDouble / h), 1.0)
      val outW = math.max(1L, math.floor(w * scale).toLong).toInt
      val outH = math.max(1L, math.floor(h * scale).toLong).toInt
      val outBytes = math.max(1L, math.floor(payload.length * scale * scale).toLong).toInt
      (payload.take(outBytes), outW, outH)
    }
  }

  /** Per-partition batched resize — the same mapPartitions +
    * grouped(batchSize) shape as [[extractFeatures]], producing records
    * whose payload and declared dims are the resized ones (the contract
    * a thumbnail/training-resolution stage hands downstream).
    */
  def resize(
      media: Dataset[MediaRecord], maxW: Int, maxH: Int,
      batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real kernel would resample `batch` as one vectorized call
        batch.iterator.map { r =>
          val (bytes, w, h) = resizeStub(r.kind, r.payload, maxW, maxH)
          MediaRecord(r.media_id, r.kind, bytes, w, h)
        }
      }
    }
  }
}
