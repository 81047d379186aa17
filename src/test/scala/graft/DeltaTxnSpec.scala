package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.DeltaInterop
import graft.streaming.EventStreams

/** Transaction-identifier (txn) semantics behind the exactly-once Delta
  * streaming sink (q162): idempotent appends, version monotonicity,
  * survival across checkpoints, and restart behavior of the sink. */
class DeltaTxnSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("delta_txn_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("appendIdempotent creates the table and gates replays") {
    val base = tmp()
    val df = spark.range(10).toDF("id").coalesce(1)
    assert(DeltaInterop.appendIdempotent(df, base, "app-1", 0L))
    assert(DeltaInterop.read(spark, base).count() == 10)
    // exact replay of batch 0 — must be skipped, no data staged
    val before = DeltaInterop.snapshot(spark, base)
    assert(!DeltaInterop.appendIdempotent(df, base, "app-1", 0L))
    val after = DeltaInterop.snapshot(spark, base)
    assert(after.version == before.version && after.files == before.files)
    // an OLDER version must also be skipped (monotone gate)
    assert(DeltaInterop.appendIdempotent(df, base, "app-1", 5L))
    assert(!DeltaInterop.appendIdempotent(df, base, "app-1", 3L))
    // a DIFFERENT app id is independent
    assert(DeltaInterop.appendIdempotent(df, base, "app-2", 0L))
    assert(DeltaInterop.read(spark, base).count() == 30)
  }

  test("txn state survives a parquet checkpoint") {
    val base = tmp()
    val df = spark.range(5).toDF("id").coalesce(1)
    assert(DeltaInterop.appendIdempotent(df, base, "stream-a", 7L))
    DeltaInterop.checkpoint(spark, base)
    // replay AFTER log compaction: the gate must come from the
    // checkpoint's txn rows, not the JSON tail
    assert(DeltaInterop.snapshot(spark, base).txnVersions ==
      Map("stream-a" -> 7L))
    assert(!DeltaInterop.appendIdempotent(df, base, "stream-a", 7L))
    assert(DeltaInterop.read(spark, base).count() == 5)
  }

  test("streamIngestDelta is exactly-once across a restart") {
    val base = tmp()
    val srcDir = tmp()
    val ckpt = tmp() + "/ckpt"
    spark.range(100).select(col("id"), (col("id") % 4).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    def stream() = spark.readStream
      .schema("id LONG, k LONG").parquet(srcDir)
    EventStreams.streamIngestDelta(stream(), base,
      appId = Some("restart-test"), checkpoint = Some(ckpt))
    assert(DeltaInterop.read(spark, base).count() == 100)
    // restart with the SAME checkpoint: no new input → no new commits;
    // the run must not double-ingest
    EventStreams.streamIngestDelta(stream(), base,
      appId = Some("restart-test"), checkpoint = Some(ckpt))
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 100)
    assert(got.agg(sum("id")).head().getLong(0) == (0 until 100).sum)
    // new file arrives → only IT is ingested on the next run
    spark.range(100, 120).select(col("id"), (col("id") % 4).as("k"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    EventStreams.streamIngestDelta(stream(), base,
      appId = Some("restart-test"), checkpoint = Some(ckpt))
    assert(DeltaInterop.read(spark, base).count() == 120)
  }
}
