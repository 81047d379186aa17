package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.EventStreams

/** The testdata contract: pins the PHYSICAL encoding of every driver
  * table and proves `Tables.load` adapts to every encoding events.ts has
  * ever shipped with.
  *
  * Round-4 incident: the driver regenerated `/root/testdata` mid-round
  * and events.ts drifted from parquet TIMESTAMP(NANOS)-as-int64 to
  * native timestamp[us]; a hard-coded nanos conversion then broke 38
  * oracle queries loudly and corrupted 3 streaming queries silently
  * (timestamps 1000× too small, clean schemas). This suite makes the
  * NEXT drift cost one red spec with an exact diagnosis instead of 41
  * silent query failures:
  *   - each table's logical schema after Tables.load is asserted
  *     name-by-name, type-by-type (fails with the offending column);
  *   - all three historical ts encodings (int64 nanos, timestamp[us]
  *     instant, timestamp[us] NTZ) round-trip through Tables.load to
  *     identical TimestampType values;
  *   - the micros-declared-as-nanos corruption class now THROWS (epoch
  *     sanity guard in EventStreams) instead of shipping shrunk rows.
  */
class TestdataContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def loadedSchema(name: String): Map[String, DataType] =
    Tables.load(spark, sfDir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  private def assertSchema(table: String, expected: (String, DataType)*): Unit = {
    val got = loadedSchema(table)
    expected.foreach { case (c, t) =>
      assert(got.contains(c), s"$table: column '$c' missing — testdata drifted; got ${got.keys.toSeq.sorted}")
      assert(got(c) == t, s"$table.$c: expected $t, testdata now reads as ${got(c)} — " +
        "physical encoding drifted; fix Tables.load / downstream casts")
    }
    assert(got.size == expected.size,
      s"$table: column set drifted — expected ${expected.map(_._1).sorted}, got ${got.keys.toSeq.sorted}")
  }

  test("every driver table reads with the pinned logical schema") {
    assertSchema("region",
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertSchema("nation",
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    assertSchema("customer",
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    assertSchema("supplier",
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    assertSchema("part",
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    assertSchema("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // naive timestamp[us] (isAdjustedToUTC=false) → NTZ pass-through;
      // the whole oracle gate is green on this encoding (DuckDB reads
      // the same file as naive timestamp)
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
    assertSchema("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
    // events.ts MUST come out TimestampType whatever the file encodes —
    // that is the whole point of the adaptive loader.
    assertSchema("events",
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
    assertSchema("documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    assertSchema("embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  }

  // ---- the three ts encodings Tables.load must survive --------------

  /** One reference instant, expressed three ways. */
  private val isoTs = "2024-03-15 10:30:00"
  private val epochMicros = java.sql.Timestamp.valueOf(isoTs).getTime * 1000L

  private def writeEventsFixture(tsCol: org.apache.spark.sql.Column,
                                 tsType: DataType): String = {
    val dir = Files.createTempDirectory("tdc_events_").toFile
    dir.deleteOnExit()
    val base = spark.range(1).select(
      lit(1L).as("event_id"),
      tsCol.cast(tsType).as("ts"),
      lit(7L).as("user_id"),
      lit("click").as("event_type"),
      lit(1.5).as("value"),
      lit("{}").as("props"))
    base.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.getPath
  }

  test("Tables.load adapts: int64 nanos encoding") {
    val dir = writeEventsFixture(lit(epochMicros * 1000L), LongType)
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(col("ts").cast("string")).head().getString(0) == isoTs)
  }

  test("Tables.load adapts: native timestamp[us] instant encoding") {
    val dir = writeEventsFixture(lit(isoTs), TimestampType)
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(col("ts").cast("string")).head().getString(0) == isoTs)
  }

  test("Tables.load adapts: timestamp_ntz encoding") {
    val dir = writeEventsFixture(lit(isoTs), TimestampNTZType)
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    // session TZ is UTC everywhere, so NTZ→TZ is value-identical
    assert(got.select(col("ts").cast("string")).head().getString(0) == isoTs)
  }

  test("Tables.load rejects an unknown ts encoding loudly") {
    val dir = writeEventsFixture(lit(isoTs), StringType)
    val e = intercept[IllegalStateException](Tables.load(spark, dir, "events"))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("readEventStream derives the stream schema from the file, not a guess") {
    // micros-instant fixture: the round-4 drift that the hard-coded
    // LongType schema silently corrupted — must now read correctly
    val dir = writeEventsFixture(lit(isoTs), TimestampType)
    val stream = EventStreams.readEventStream(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
  }

  test("event-time guard is footer-stats-only: zero records read at stream construction") {
    // The epoch-sanity guard must be O(metadata) at 100 TB: parquet
    // footer row-group min/max, never data pages. Any data-page scan
    // shows up as recordsRead > 0 in task input metrics (footer reads
    // record zero rows), so construction-wide recordsRead == 0 proves
    // no data was scanned — while the corruption test below proves the
    // guard still fires from those same footer stats.
    val dir = writeEventsFixture(lit(isoTs), TimestampType)
    val records = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          records.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val stream = EventStreams.readEventStream(spark, dir)
      assert(stream.isStreaming)
      // listener events are async; give the bus a moment to drain
      Thread.sleep(1500)
      assert(records.get() == 0L,
        s"stream construction read ${records.get()} records — the event-time " +
        "guard is scanning data pages instead of footer stats")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("micros-declared-as-nanos corruption THROWS instead of shipping garbage") {
    // int64 column holding MICROS (not nanos): div 1000 shrinks every
    // timestamp 1000× toward 1970 — the silent-wrong-answer class. The
    // epoch sanity guard must refuse to build the stream.
    val dir = writeEventsFixture(lit(epochMicros), LongType)
    val e = intercept[IllegalArgumentException](
      EventStreams.readEventStream(spark, dir))
    assert(e.getMessage.contains("sanity check failed"))
  }

  test("registerAll isolates a broken table instead of failing every query") {
    // dir with a valid nation but a corrupt events file: SQL over nation
    // must still work; only events is unavailable.
    val dir = Files.createTempDirectory("tdc_isolate_").toFile
    dir.deleteOnExit()
    Tables.load(spark, sfDir, "nation").write.mode("overwrite")
      .parquet(s"$dir/nation.parquet")
    Files.createDirectories(dir.toPath.resolve("events.parquet"))
    Files.writeString(
      dir.toPath.resolve("events.parquet").resolve("junk.parquet"),
      "this is not parquet")
    val others = Tables.names.filterNot(n => n == "nation" || n == "events")
    others.foreach { n =>
      Tables.load(spark, sfDir, n).limit(1).write.mode("overwrite")
        .parquet(s"$dir/$n.parquet")
    }
    Tables.registerAll(spark, dir.getPath)
    try {
      assert(spark.sql("SELECT count(*) AS n FROM nation").head().getLong(0) == 25L)
      val err = intercept[Exception](spark.sql("SELECT count(*) FROM events").collect())
      assert(err.getMessage.toLowerCase.contains("table_or_view_not_found") ||
        err.getMessage.contains("events"))
    } finally {
      // re-register the real testdata so later suites sharing this
      // session see the real views again
      Tables.registerAll(spark, sfDir)
    }
  }
}
