package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * resize / frame-sampling run as partition-parallel typed
  * mapPartitions over batched rows (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage: one JVM-side iterator per partition, no
  * per-row driver involvement, arbitrary native code at the center).
  *
  * THE CODEC IS A STUB. No image/audio libraries exist in this
  * environment, so `decodeStub` derives deterministic pseudo-features
  * from the payload bytes. Everything around it — schema, batching,
  * partitioning, output shape — is the real pipeline and is tested.
  * Swap `decodeStub` for JNI/FFmpeg/JPEG decoding in production.
  */
object Multimodal {

  /** Canonical multimodal row: id + modality tag + raw payload + typed
    * metadata (width/height for images, sample rate for audio, ...). */
  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, modality: String,
                           n_bytes: Long, features: Array[Float])

  case class FrameSample(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** === STUB === Deterministic fake "decode + featurize": a 16-bin byte
    * histogram normalized to [0,1]. Stands in for a real codec; the
    * surrounding plumbing (batch iteration, output schema) is real. */
  private[ops] def decodeStub(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val hist = new Array[Float](dim)
    if (payload.nonEmpty) {
      payload.foreach(b => hist((b & 0xFF) % dim) += 1f)
      var i = 0
      while (i < dim) { hist(i) /= payload.length; i += 1 }
    }
    hist
  }

  /** Feature extraction: one pass per partition, rows streamed through
    * the (stubbed) codec. At 100 TB this is the stage that hosts the
    * expensive native decode — mapPartitions amortizes codec init across
    * the partition instead of paying it per row. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16)
                     (implicit enc: Encoder[MediaFeatures]): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      // per-partition codec init would go here (once, not per row)
      rows.map { r =>
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
          decodeStub(r.payload, dim))
      }
    }

  case class ResizedMedia(media_id: Long, modality: String,
                          width: Int, height: Int, payload: Array[Byte])

  /** === STUB === Deterministic "resize": nearest-neighbor downsample of
    * the payload interpreted as a width×height byte grid. Stands in for
    * a real image resampler; the partition-parallel shape (mapPartitions,
    * codec init amortized per partition) is the real pipeline. */
  private[ops] def resizeStub(payload: Array[Byte], srcW: Int, srcH: Int,
                              dstW: Int, dstH: Int): Array[Byte] = {
    val out = new Array[Byte](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = y.toLong * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x.toLong * srcW / dstW
        val idx = (sy * srcW + sx) % math.max(payload.length, 1)
        out(y * dstW + x) = if (payload.isEmpty) 0 else payload(idx.toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize image-modality rows to a target geometry — one stubbed-codec
    * pass per partition, emitting the standardized payload a training
    * pipeline feeds to patch/pixel tokenizers. */
  def resizeImages(media: Dataset[MediaRow], dstW: Int, dstH: Int)
                  (implicit enc: Encoder[ResizedMedia]): Dataset[ResizedMedia] =
    media.filter(_.modality == "image").mapPartitions { rows =>
      // per-partition resampler init would go here (once, not per row)
      rows.map { r =>
        ResizedMedia(r.media_id, r.modality, dstW, dstH,
          resizeStub(r.payload, r.width, r.height, dstW, dstH))
      }
    }

  /** Deterministic frame sampling for video-modality rows: every
    * `stride`-th fixed-size block of the payload as a "frame" (===
    * STUB === for keyframe extraction; the explode shape is real). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int)
                  (implicit enc: Encoder[FrameSample]): Dataset[FrameSample] =
    media.filter(_.modality == "video").flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by stride).map { f =>
        FrameSample(r.media_id, f,
          r.payload.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }

  /** Metadata-level stats, pure DataFrame ops (no decode): per modality,
    * payload volume and dimensions — the catalog-query side of a media
    * lakehouse. */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(length(col("payload"))).as("total_bytes"),
        avg(col("width")).as("avg_width"),
        avg(col("height")).as("avg_height"))
      .orderBy(col("modality"))

  /** Deterministic synthetic media frame for tests/demos: payload bytes
    * derive from the id (no RNG → reproducible across runs/partitions). */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int)
                    (implicit enc: Encoder[MediaRow]): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val modality = Seq("image", "audio", "video")(i.toInt % 3)
      val size = 64 + (i.toInt % 5) * 32
      val payload = Array.tabulate(size)(j => ((i * 31 + j * 7) % 256).toByte)
      MediaRow(i, modality, payload, 640, 480, 16000)
    }
  }
}
