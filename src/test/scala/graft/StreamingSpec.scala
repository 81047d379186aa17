package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed type stats over a replayed event stream match the batch result") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.windowedTypeStats(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("win_stats").start()
    try {
      q.processAllAvailable()
      // Append mode only emits watermark-finalized windows; replaying a
      // finite file leaves the last window(s) open, so compare against
      // the batch computation restricted to emitted windows.
      val got = spark.table("win_stats")
      assert(got.count() > 0)
      val batch = Tables.load(spark, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n_events"))
      val joined = got.select("window_start", "event_type", "n_events")
        .join(batch.withColumnRenamed("n_events", "batch_n"),
          Seq("window_start", "event_type"), "left")
      assert(joined.filter(col("n_events") =!= col("batch_n")).count() == 0)
    } finally q.stop()
  }

  test("stateful sessionization emits gap-closed sessions") {
    import EventStreams.{Event, SessionOut}
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val events = Seq(
      Event(1, ts(0), 1L, "click", 1.0),
      Event(2, ts(60), 1L, "click", 1.0),      // same session
      Event(3, ts(10000), 1L, "click", 1.0),   // gap > 30min → closes first
      Event(4, ts(0), 2L, "view", 1.0)).toDS()
    val sessions = EventStreams.sessionizeStream(events, 1800L * 1000000)
      .collect().toSeq
    // batch Dataset drive: only user 1's first session closes (second stays open)
    assert(sessions == Seq(SessionOut(1L, 0L, 60000000L, 2L)))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Multimodal

  private lazy val media = Multimodal.syntheticMedia(spark, 30)

  test("feature extraction yields normalized fixed-dim vectors per row") {
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3) // histogram normalized
    }
    // determinism: same id → same features
    val again = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("codec seam: a runtime-registered codec claims its payloads without touching Multimodal") {
    // a stub compressed-format codec (JPEG magic FF D8) registered at
    // runtime — the same seam a JNI decoder uses in production. The
    // pipeline code is untouched; the codec rides the task closure.
    object StubJpeg extends Multimodal.PayloadCodec {
      val name = "stub-jpeg"
      def sniff(p: Array[Byte]): Boolean =
        p.length >= 2 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8
      def features(p: Array[Byte], dim: Int): Array[Float] = {
        val f = new Array[Float](dim); f(0) = 1f; f // recognizable signature
      }
    }
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 1, 2, 3, 4)
    val rows = Seq(
      Multimodal.MediaRow(900L, "image", jpeg, 0, 0, 0),
      media.filter(_.modality == "image").head()).toDS()
    Multimodal.registerCodec(StubJpeg)
    try {
      val got = Multimodal.extractFeatures(rows, dim = 16).collect()
        .map(f => f.media_id -> f.features).toMap
      // stub claimed the JPEG payload...
      assert(got(900L).toSeq == (1f +: Seq.fill(15)(0f)))
      // ...and the built-in PPM path is untouched
      assert(math.abs(got.filterNot(_._1 == 900L).head._2.sum - 1f) < 1e-3)
      assert(got.filterNot(_._1 == 900L).head._2.toSeq !=
        (1f +: Seq.fill(15)(0f)))
    } finally Multimodal.unregisterCodec("stub-jpeg")
    // after unregistration the same payload falls back to the histogram
    val fallback = Multimodal.extractFeatures(rows.filter(_.media_id == 900L),
      dim = 16).head().features
    assert(fallback.toSeq != (1f +: Seq.fill(15)(0f)))
    assert(math.abs(fallback.sum - 1f) < 1e-3)
  }

  test("frame sampling explodes video payloads into fixed-size frames") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length == 32))
    assert(frames.forall(_.frame_idx % 2 == 0))
  }

  test("resize emits real 8x8 PPMs decoded from real source pixels") {
    val resized = Multimodal.resizeImages(media, dstW = 8, dstH = 8).collect()
    assert(resized.length == 10) // image rows only
    resized.foreach { r =>
      val img = graft.ops.Codecs.decodePpm(r.payload)
      assert((img.width, img.height) == (8, 8))
      assert(img.pixels.length == 8 * 8 * 3)
    }
    // every output pixel is an actual source pixel (nearest neighbor)
    val src = media.filter(_.modality == "image").collect()
      .map(r => r.media_id -> graft.ops.Codecs.decodePpm(r.payload)).toMap
    resized.foreach { r =>
      val out = graft.ops.Codecs.decodePpm(r.payload)
      val in = src(r.media_id)
      // corner pixel (0,0) maps to source (0,0)
      assert(out.pixels.take(3).toSeq == in.pixels.take(3).toSeq)
    }
    // determinism
    val again = Multimodal.resizeImages(media, dstW = 8, dstH = 8).collect()
    assert(resized.map(_.payload.toSeq).toSeq == again.map(_.payload.toSeq).toSeq)
  }

  test("PPM and WAV codecs round-trip byte-exactly (incl. header comments / extra chunks)") {
    import graft.ops.Codecs
    val img = Codecs.Image(3, 2, Array.tabulate(18)(i => (i * 11).toByte))
    val back = Codecs.decodePpm(Codecs.encodePpm(img))
    assert((back.width, back.height) == (3, 2))
    assert(back.pixels.toSeq == img.pixels.toSeq)
    // header comments are part of the P6 grammar
    val commented = ("P6\n# a comment\n3 2\n# another\n255\n").getBytes("US-ASCII") ++
      img.pixels
    val viaComment = Codecs.decodePpm(commented)
    assert(viaComment.pixels.toSeq == img.pixels.toSeq)

    val audio = Codecs.Audio(16000, 1,
      Array.tabulate[Short](50)(i => (i * 321 - 8000).toShort))
    val wav = Codecs.decodeWav(Codecs.encodeWav(audio))
    assert(wav.sampleRate == 16000 && wav.channels == 1)
    assert(wav.samples.toSeq == audio.samples.toSeq)
    // features derive from decoded samples, not container bytes: a WAV
    // with identical samples but different header noise featurizes equal
    val sameSamples = Codecs.encodeWav(audio)
    assert(Multimodal.decodeFeatures(sameSamples, 16).toSeq ==
      Multimodal.audioFeatures(audio, 16).toSeq)
  }

  test("image features are a luminance histogram over decoded pixels") {
    import graft.ops.Codecs
    // all-white 2x2 image: every pixel's luma = 255 → all mass in last bin
    val white = Codecs.Image(2, 2, Array.fill(12)(0xFF.toByte))
    val f = Multimodal.imageFeatures(white, 16)
    assert(f(15) == 1.0f && f.take(15).forall(_ == 0f))
    // all-black: all mass in first bin
    val black = Codecs.Image(2, 2, Array.fill(12)(0.toByte))
    val g = Multimodal.imageFeatures(black, 16)
    assert(g(0) == 1.0f && g.drop(1).forall(_ == 0f))
  }

  test("mediaStats aggregates metadata without touching payloads") {
    val stats = Multimodal.mediaStats(media.toDF())
      .select("modality", "n_items").as[(String, Long)].collect().toMap
    assert(stats == Map("image" -> 10L, "audio" -> 10L, "video" -> 10L))
  }
}
