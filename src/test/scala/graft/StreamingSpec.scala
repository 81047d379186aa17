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

  test("frame sampling explodes video payloads into fixed-size frames") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length == 32))
    assert(frames.forall(_.frame_idx % 2 == 0))
  }

  test("resize emits fixed-geometry payloads for image rows only") {
    val resized = Multimodal.resizeImages(media, dstW = 8, dstH = 8).collect()
    assert(resized.length == 10) // image rows only
    assert(resized.forall(_.payload.length == 64))
    // determinism
    val again = Multimodal.resizeImages(media, dstW = 8, dstH = 8).collect()
    assert(resized.map(_.payload.toSeq).toSeq == again.map(_.payload.toSeq).toSeq)
  }

  test("mediaStats aggregates metadata without touching payloads") {
    val stats = Multimodal.mediaStats(media.toDF())
      .select("modality", "n_items").as[(String, Long)].collect().toMap
    assert(stats == Map("image" -> 10L, "audio" -> 10L, "video" -> 10L))
  }
}
