package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** transformWithState (Spark 4 arbitrary stateful processing): the
  * per-user ValueState/MapState processor must produce the exact batch
  * GROUP BY totals, and must do so REGARDLESS of how the replay is
  * micro-batched — the emissions are cumulative, so max() per key
  * collapses any batching to the same answer. The multi-batch case is
  * forced with a 4-file copy of the events table + maxFilesPerTrigger=1
  * (the sf dirs are single-file, so the plain query path alone would
  * only ever see one batch). */
class TransformWithStateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def batchExpected(events: org.apache.spark.sql.DataFrame) = {
    val per = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .withColumn("event_type", lit("__all__"))
      .select(col("user_id"), col("event_type"), col("n"))
    per.unionByName(tot)
  }

  private def collapse(emitted: org.apache.spark.sql.DataFrame) =
    emitted.groupBy(col("user_id"), col("event_type"))
      .agg(max(col("n_events")).as("n"))

  test("single-batch replay matches the batch GROUP BY exactly") {
    val emitted = EventStreams.userTypeCountsTws(
      EventStreams.readEventStream(spark, sfDir))
    val got = collapse(emitted).orderBy(col("user_id"), col("event_type"))
      .collect().map(_.toString).toSeq
    val want = batchExpected(Tables.load(spark, sfDir, "events"))
      .orderBy(col("user_id"), col("event_type"))
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("multi-batch replay (maxFilesPerTrigger=1 over 4 splits) is batch-invariant") {
    val events = Tables.load(spark, sfDir, "events")
    val dir = Files.createTempDirectory("tws_multi").toFile
    dir.deleteOnExit()
    // 4 physical files -> 4 micro-batches; state carries across batches.
    events.repartition(4).write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
    val emitted = EventStreams.userTypeCountsTws(stream)
    // With >1 batch, some user emits cumulative rows in more than one
    // batch — assert the multi-batch path actually ran (emissions exceed
    // the final distinct key count), then assert exactness.
    val nEmitted = emitted.count()
    val nKeys = collapse(emitted).count()
    assert(nEmitted > nKeys, s"expected multi-batch emissions, got $nEmitted rows for $nKeys keys")
    val got = collapse(emitted).orderBy(col("user_id"), col("event_type"))
      .collect().map(_.toString).toSeq
    val want = batchExpected(events)
      .orderBy(col("user_id"), col("event_type"))
      .collect().map(_.toString).toSeq
    assert(got == want)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
