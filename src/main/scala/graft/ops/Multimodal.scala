package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * resize / frame-sampling run as partition-parallel typed
  * mapPartitions over batched rows (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage: one JVM-side iterator per partition, no
  * per-row driver involvement, arbitrary native code at the center).
  *
  * The codecs are REAL: binary PPM images and PCM WAV audio are parsed
  * byte-exactly by `Codecs` (both formats are uncompressed, hence
  * implementable faithfully with zero dependencies — this environment
  * ships no media libraries). Features derive from decoded PIXELS and
  * SAMPLES, not payload bytes. Unrecognized payloads (e.g. the raw
  * frame-concatenation "video" fixtures, which have no container
  * format) fall back to a byte-level histogram — a documented fallback
  * for unknown containers, not a stand-in for the implemented ones.
  * Compressed formats (JPEG/FLAC/H.264) slot into the same
  * per-partition seam via JNI in production.
  */
object Multimodal {

  /** Canonical multimodal row: id + modality tag + raw payload + typed
    * metadata (width/height for images, sample rate for audio, ...). */
  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, modality: String,
                           n_bytes: Long, features: Array[Float])

  case class FrameSample(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Normalized dim-bin luminance histogram over REAL decoded pixels
    * (ITU-R 601 integer luma). */
  private[graft] def imageFeatures(img: Codecs.Image, dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val r = img.pixels(3 * i) & 0xFF
      val g = img.pixels(3 * i + 1) & 0xFF
      val b = img.pixels(3 * i + 2) & 0xFF
      val luma = (299 * r + 587 * g + 114 * b) / 1000 // 0..255
      hist(luma * dim / 256) += 1f
      i += 1
    }
    if (n > 0) { var j = 0; while (j < dim) { hist(j) /= n; j += 1 } }
    hist
  }

  /** Normalized dim-bin amplitude histogram over REAL decoded samples
    * (absolute 16-bit amplitude). */
  private[graft] def audioFeatures(a: Codecs.Audio, dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    val n = a.samples.length
    var i = 0
    while (i < n) {
      val amp = math.min(math.abs(a.samples(i).toInt), 32767)
      hist(amp * dim / 32768) += 1f
      i += 1
    }
    if (n > 0) { var j = 0; while (j < dim) { hist(j) /= n; j += 1 } }
    hist
  }

  /** Fallback for container-less payloads: normalized byte histogram. */
  private[graft] def byteHistogram(payload: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    if (payload.nonEmpty) {
      payload.foreach(b => hist((b & 0xFF) % dim) += 1f)
      var i = 0
      while (i < dim) { hist(i) /= payload.length; i += 1 }
    }
    hist
  }

  /** A pluggable payload codec — THE seam where compressed formats
    * (JPEG/FLAC/H.264 via JNI) slot in at runtime without touching the
    * pipeline: `sniff` claims a payload by magic bytes, `features`
    * decodes it. Must be Serializable: registered codecs ride the task
    * closure to the executors (a JNI-backed one additionally needs its
    * native library on the executor hosts, the standard JNI contract). */
  trait PayloadCodec extends Serializable {
    def name: String
    def sniff(payload: Array[Byte]): Boolean
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Runtime codec registry. Registered codecs take priority over the
    * built-ins (PPM/WAV), first claim wins; unknown payloads fall back
    * to the byte histogram. The registry is read ONCE when a stage is
    * planned (captured into the closure), so concurrent registration
    * never tears a running job. */
  @volatile private var registeredCodecs: Seq[PayloadCodec] = Seq.empty

  def registerCodec(c: PayloadCodec): Unit = synchronized {
    registeredCodecs = registeredCodecs.filterNot(_.name == c.name) :+ c
  }

  def unregisterCodec(name: String): Unit = synchronized {
    registeredCodecs = registeredCodecs.filterNot(_.name == name)
  }

  /** Decode + featurize one payload: registered codecs first, then the
    * built-in containers sniffed by magic bytes, features from real
    * pixels/samples where a codec exists. */
  private[graft] def decodeFeatures(payload: Array[Byte], dim: Int,
                                    extra: Seq[PayloadCodec]): Array[Float] =
    extra.find(_.sniff(payload)) match {
      case Some(c) => c.features(payload, dim)
      case None => Codecs.sniff(payload) match {
        case "ppm" => imageFeatures(Codecs.decodePpm(payload), dim)
        case "wav" => audioFeatures(Codecs.decodeWav(payload), dim)
        case _ => byteHistogram(payload, dim)
      }
    }

  private[graft] def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    decodeFeatures(payload, dim, registeredCodecs)

  /** Feature extraction: one pass per partition, rows streamed through
    * the codecs. At 100 TB this is the stage that hosts the expensive
    * native decode — mapPartitions amortizes codec init across the
    * partition instead of paying it per row. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16)
                     (implicit enc: Encoder[MediaFeatures]): Dataset[MediaFeatures] = {
    // snapshot the registry at plan time: the Seq rides the closure to
    // the executors, so every task of this job sees the same codecs
    val codecs = registeredCodecs
    media.mapPartitions { rows =>
      // per-partition native-codec init would go here (once, not per row)
      rows.map { r =>
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
          decodeFeatures(r.payload, dim, codecs))
      }
    }
  }

  case class ResizedMedia(media_id: Long, modality: String,
                          width: Int, height: Int, payload: Array[Byte])

  /** Resize image-modality rows to a target geometry: decode the PPM,
    * nearest-neighbor-resample the REAL RGB raster, re-encode — one
    * codec pass per partition, emitting the standardized payload a
    * training pipeline feeds to patch/pixel tokenizers. */
  def resizeImages(media: Dataset[MediaRow], dstW: Int, dstH: Int)
                  (implicit enc: Encoder[ResizedMedia]): Dataset[ResizedMedia] =
    media.filter(_.modality == "image").mapPartitions { rows =>
      // per-partition resampler init would go here (once, not per row)
      rows.map { r =>
        val img = Codecs.decodePpm(r.payload)
        val out = Codecs.resizeNearest(img, dstW, dstH)
        ResizedMedia(r.media_id, r.modality, dstW, dstH, Codecs.encodePpm(out))
      }
    }

  /** Deterministic frame sampling for video-modality rows: every
    * `stride`-th fixed-size block of the payload as a "frame" (the
    * fixtures' video payloads are raw concatenated frames — no container
    * format exists to parse; a real keyframe extractor slots in at this
    * same seam). */
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

  /** Deterministic synthetic media for tests/demos — REAL containers:
    * images are valid binary PPMs (16×12 deterministic RGB gradient),
    * audio is valid 16-bit PCM WAV (deterministic sawtooth-ish wave),
    * video is raw concatenated frames. Payload bytes derive from the id
    * (no RNG → reproducible across runs/partitions). */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int)
                    (implicit enc: Encoder[MediaRow]): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      (i % 3) match {
        case 0 =>
          val (w, h) = (16, 12)
          val px = Array.tabulate(w * h * 3)(j => ((i * 31 + j * 7) % 256).toByte)
          MediaRow(i, "image", Codecs.encodePpm(Codecs.Image(w, h, px)),
            w, h, 0)
        case 1 =>
          val len = 64 + (i.toInt % 5) * 32
          val samples = Array.tabulate(len)(j =>
            (((i * 131 + j * 517) % 4096) - 2048).toShort)
          MediaRow(i, "audio",
            Codecs.encodeWav(Codecs.Audio(16000, 1, samples)), 0, 0, 16000)
        case _ =>
          val size = 64 + (i.toInt % 5) * 32
          val payload = Array.tabulate(size)(j => ((i * 31 + j * 7) % 256).toByte)
          MediaRow(i, "video", payload, 640, 480, 0)
      }
    }
  }
}
