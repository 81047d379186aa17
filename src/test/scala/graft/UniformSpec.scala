package graft

import java.io.File

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import graft.pipeline.GraftSql
import graft.sources.{DeltaDml, DeltaInterop, IcebergInterop, Uniform}

/** Delta Universal Format: one base directory holding `_delta_log/`
  * (the writable truth) plus an Iceberg mirror under `metadata/` over
  * the SAME data files. Every Delta commit must become visible to the
  * Iceberg reader after a sync — appends incrementally (manifest
  * reuse), everything else as an overwrite snapshot with DV state
  * translated to position deletes. The Iceberg side is read-only. */
class UniformSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_uniform_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def meta(base: String): com.fasterxml.jackson.databind.JsonNode = {
    val hint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base, "metadata", "version-hint.text"))).trim
    mapper.readTree(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base, "metadata", s"v$hint.metadata.json"))))
  }

  private def trackedVersion(base: String): Long =
    meta(base).get("properties").get(Uniform.TrackKey).asText().toLong

  private def latestOp(base: String): String = {
    val m = meta(base)
    val cur = m.get("current-snapshot-id").asLong()
    val ss = m.get("snapshots")
    (0 until ss.size()).map(ss.get)
      .find(_.get("snapshot-id").asLong() == cur).get
      .get("summary").get("operation").asText()
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(df.columns.map(col).toSeq: _*).collect().toSeq

  test("enable publishes a readable mirror; partitioned values exact") {
    val base = freshBase("enable")
    val df = (0L until 200L).map(k => (k, (k % 4).toInt, s"r$k"))
      .toDF("id", "p", "tag")
    DeltaInterop.overwrite(df.repartition(3), base, partitionBy = Seq("p"))
    Uniform.enable(spark, base)
    assert(trackedVersion(base) >= 0L)
    // the mirror reads the SAME files, partition column filled from
    // the manifests (spec Column Projection)
    assert(sortedRows(IcebergInterop.read(spark, base)
             .select("id", "p", "tag")) ==
           sortedRows(DeltaInterop.read(spark, base)
             .select("id", "p", "tag")))
    // partition pruning works through the mirror
    assert(IcebergInterop.read(spark, base, partitionFilters = Map("p" -> "2"))
      .count() == 50L)
    // enable is idempotent
    val hintBefore = trackedVersion(base)
    Uniform.enable(spark, base)
    assert(trackedVersion(base) == hintBefore)
  }

  test("append-only sync reuses every existing manifest (append snapshot)") {
    val base = freshBase("append")
    DeltaInterop.overwrite((0L until 100L).toDF("id").coalesce(1), base)
    Uniform.enable(spark, base)
    val m0 = meta(base)
    val manifestsBefore = new File(base, "metadata").list()
      .count(_.startsWith("manifest-"))
    DeltaInterop.append((100L until 150L).toDF("id").coalesce(1), base)
    Uniform.sync(spark, base)
    assert(latestOp(base) == "append")
    assert(trackedVersion(base) ==
      DeltaInterop.snapshot(spark, base).version)
    // exactly ONE new manifest — O(new files) metadata, not a rebuild
    val manifestsAfter = new File(base, "metadata").list()
      .count(_.startsWith("manifest-"))
    assert(manifestsAfter == manifestsBefore + 1)
    assert(IcebergInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 150L).sum)
    // the new snapshot chains off the old one
    val m1 = meta(base)
    val cur = m1.get("current-snapshot-id").asLong()
    val snapNode = {
      val ss = m1.get("snapshots")
      (0 until ss.size()).map(ss.get)
        .find(_.get("snapshot-id").asLong() == cur).get
    }
    assert(snapNode.get("parent-snapshot-id").asLong() ==
      m0.get("current-snapshot-id").asLong())
  }

  test("DV delete republishes as overwrite with position deletes") {
    val base = freshBase("dv")
    DeltaInterop.overwrite((0L until 100L).toDF("id").coalesce(1), base)
    Uniform.enable(spark, base)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") % 10 === 3)
    Uniform.sync(spark, base)
    assert(latestOp(base) == "overwrite")
    val got = IcebergInterop.read(spark, base)
      .agg(count(lit(1)), sum("id")).head()
    assert(got.getLong(0) == 90L)
    assert(got.getLong(1) == (0L until 100L).filterNot(_ % 10 == 3).sum)
  }

  test("sync is a no-op when current; metadata version unchanged") {
    val base = freshBase("noop")
    DeltaInterop.overwrite((0L until 10L).toDF("id"), base)
    Uniform.enable(spark, base)
    val hint0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base, "metadata", "version-hint.text")))
    Uniform.sync(spark, base)
    val hint1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base, "metadata", "version-hint.text")))
    assert(hint0 == hint1)
  }

  test("the Iceberg side of a mirror is read-only") {
    val base = freshBase("readonly")
    DeltaInterop.overwrite((0L until 10L).toDF("id"), base)
    Uniform.enable(spark, base)
    val e1 = intercept[IllegalArgumentException](
      IcebergInterop.append((10L until 20L).toDF("id"), base))
    assert(e1.getMessage.contains("read-only"))
    val e2 = intercept[IllegalStateException](
      IcebergInterop.setTableProperties(base, Map("k" -> "v")))
    assert(e2.getMessage.contains("read-only"))
    val e3 = intercept[IllegalStateException](
      IcebergInterop.rollbackTo(base, 1L))
    assert(e3.getMessage.contains("read-only"))
  }

  test("mapped UniForm: RENAME and DROP mirror via the mapping ids") {
    val base = freshBase("mapped")
    DeltaInterop.overwrite((0L until 60L).map(k => (k, k * 2, s"t$k"))
      .toDF("id", "v", "tag").coalesce(1), base)
    DeltaInterop.enableColumnMapping(spark, base)
    Uniform.enable(spark, base)
    val idBefore = {
      val m = meta(base); val fs = m.get("schemas").get(0).get("fields")
      (0 until fs.size()).map(fs.get)
        .find(_.get("name").asText() == "v").get.get("id").asInt()
    }
    // rename is metadata-only on BOTH sides: the mirror keeps the
    // field id (= the Delta mapping id) and publishes no snapshot
    val snapBefore = meta(base).get("current-snapshot-id").asLong()
    DeltaInterop.renameColumn(spark, base, "v", "score")
    Uniform.sync(spark, base)
    val m1 = meta(base)
    assert(m1.get("current-snapshot-id").asLong() == snapBefore,
      "a pure rename must not publish a snapshot")
    val curSid = m1.get("current-schema-id").asInt()
    val fields1 = {
      val ss = m1.get("schemas")
      (0 until ss.size()).map(ss.get)
        .find(_.get("schema-id").asInt() == curSid).get.get("fields")
    }
    val byName = (0 until fields1.size()).map(fields1.get)
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    assert(byName("score") == idBefore) // the id carried the rename
    // old files resolve through the name mapping (physical name 'v')
    assert(IcebergInterop.read(spark, base).agg(sum("score"))
      .head().getLong(0) == (0L until 60L).map(_ * 2).sum)
    // DROP retires the column; appends under the new shape mirror
    DeltaInterop.dropColumns(spark, base, Seq("tag"))
    DeltaInterop.append((60L until 70L).map(k => (k, k * 2))
      .toDF("id", "score").coalesce(1), base)
    Uniform.sync(spark, base)
    val got = IcebergInterop.read(spark, base)
    assert(got.columns.toSeq == Seq("id", "score"))
    assert(got.agg(sum("score")).head().getLong(0)
      == (0L until 70L).map(_ * 2).sum)
  }

  test("Delta ADD COLUMNS evolves the mirror schema; field ids stable") {
    val base = freshBase("evolve")
    DeltaInterop.overwrite((0L until 50L).toDF("id").coalesce(1), base)
    Uniform.enable(spark, base)
    val idBefore = meta(base).get("schemas").get(0).get("fields").get(0)
      .get("id").asInt()
    DeltaInterop.addColumns(spark, base,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bonus",
          org.apache.spark.sql.types.LongType))))
    DeltaInterop.append((50L until 60L).map(k => (k, k * 7))
      .toDF("id", "bonus").coalesce(1), base)
    Uniform.sync(spark, base)
    val m = meta(base)
    val curSid = m.get("current-schema-id").asInt()
    assert(curSid > 0) // a NEW schema id, old schemas kept
    val curSchema = {
      val ss = m.get("schemas")
      (0 until ss.size()).map(ss.get)
        .find(_.get("schema-id").asInt() == curSid).get
    }
    val fields = curSchema.get("fields")
    val byName = (0 until fields.size()).map(fields.get)
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    assert(byName("id") == idBefore) // existing name keeps its id
    assert(byName("bonus") > idBefore) // new name minted past it
    val got = IcebergInterop.read(spark, base)
    assert(got.filter(col("id") < 50).filter(col("bonus").isNotNull)
      .count() == 0L) // old files read NULL
    assert(got.filter(col("id") >= 50).agg(sum("bonus")).head().getLong(0)
      == (50L until 60L).map(_ * 7).sum)
  }

  test("statement-layer auto-sync: SQL alone maintains the mirror") {
    val base = freshBase("sqlhook")
    DeltaInterop.overwrite(
      (0L until 100L).map(k => (k, k * 2)).toDF("id", "v").coalesce(1), base)
    GraftSql.registerDeltaTable(spark, "uniform_sql_t", base)
    // enablement itself goes through SQL — the statement's own drain
    // publishes the initial mirror
    GraftSql.sql(spark, "ALTER TABLE uniform_sql_t SET TBLPROPERTIES " +
      s"('${Uniform.PropKey}'='iceberg')")
    assert(trackedVersion(base) ==
      DeltaInterop.snapshot(spark, base).version)
    GraftSql.sql(spark,
      "INSERT INTO uniform_sql_t SELECT id + 1000 AS id, v " +
      "FROM uniform_sql_t WHERE id < 10")
    assert(trackedVersion(base) ==
      DeltaInterop.snapshot(spark, base).version)
    GraftSql.sql(spark, "DELETE FROM uniform_sql_t WHERE id % 5 = 1")
    assert(trackedVersion(base) ==
      DeltaInterop.snapshot(spark, base).version)
    // mirror == delta, value-exact, with no explicit sync anywhere
    assert(sortedRows(IcebergInterop.read(spark, base)) ==
           sortedRows(DeltaInterop.read(spark, base)))
  }

  test("VACUUM never touches the mirror and pre-syncs a lagging one") {
    val base = freshBase("vacuum")
    DeltaInterop.overwrite((0L until 80L).toDF("id").repartition(4), base)
    Uniform.enable(spark, base)
    // OPTIMIZE rewrites the live set; the mirror now LAGS (references
    // the pre-compaction files) until vacuum's pre-sync catches it up
    DeltaInterop.optimize(spark, base)
    DeltaInterop.vacuum(spark, base, retainMillis = 0L)
    assert(trackedVersion(base) ==
      DeltaInterop.snapshot(spark, base).version)
    assert(IcebergInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 80L).sum)
    // the mirror directory survived the walk
    assert(new File(base, "metadata").exists())
  }

  test("mirror time travel: snapshots map to Delta versions") {
    val base = freshBase("travel")
    DeltaInterop.overwrite((0L until 30L).toDF("id").coalesce(1), base)
    Uniform.enable(spark, base)
    val firstSnap = meta(base).get("current-snapshot-id").asLong()
    DeltaInterop.append((30L until 60L).toDF("id").coalesce(1), base)
    Uniform.sync(spark, base)
    // reading the OLD mirror snapshot sees exactly the old contents
    assert(IcebergInterop.read(spark, base, snapshotId = Some(firstSnap))
      .agg(sum("id")).head().getLong(0) == (0L until 30L).sum)
    assert(IcebergInterop.read(spark, base)
      .agg(sum("id")).head().getLong(0) == (0L until 60L).sum)
  }

  test("snapshot history trims to keep-snapshots; pinned by default 20") {
    val base = freshBase("trim")
    DeltaInterop.overwrite((0L until 5L).toDF("id").coalesce(1), base)
    // small retention so the trim is observable
    DeltaInterop.setProperties(spark, base, Map(Uniform.PropKey -> "iceberg"))
    Uniform.sync(spark, base)
    // drive keep-snapshots via the mirror property: set BEFORE syncs
    // happen is not possible through the read-only mirror, so this
    // test accepts the default and checks the bound holds
    (0 until 3).foreach { i =>
      DeltaInterop.append(Seq(100L + i).toDF("id").coalesce(1), base)
      Uniform.sync(spark, base)
    }
    val ss = meta(base).get("snapshots")
    assert(ss.size() <= 20 && ss.size() >= 2)
  }

  test("streaming sink into a uniform table: the mirror follows each batch") {
    val base = freshBase("stream")
    val srcDir = freshBase("stream_src")
    DeltaInterop.overwrite(
      spark.range(10).select(col("id"), (col("id") % 4).as("k")), base)
    Uniform.enable(spark, base)
    spark.range(10, 60).select(col("id"), (col("id") % 4).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    graft.streaming.EventStreams.streamIngestDelta(
      spark.readStream.schema("id LONG, k LONG").parquet(srcDir), base)
    // NO explicit sync anywhere: the per-batch drain maintained it
    assert(trackedVersion(base) ==
      DeltaInterop.snapshot(spark, base).version)
    assert(IcebergInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 60L).sum)
  }

  test("foreign Iceberg table refuses a uniform sync over it") {
    val base = freshBase("foreign")
    // a real Delta table...
    DeltaInterop.overwrite((0L until 10L).toDF("id"), base)
    // ...with FOREIGN Iceberg metadata already at the same base
    val fake = new File(base, "metadata")
    fake.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "metadata", "version-hint.text"),
      "1".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "metadata", "v1.metadata.json"),
      """{"format-version":2,"properties":{}}""".getBytes)
    DeltaInterop.setProperties(spark, base, Map(Uniform.PropKey -> "iceberg"))
    val e = intercept[IllegalStateException](Uniform.sync(spark, base))
    assert(e.getMessage.contains("NOT managed"))
    // the statement-layer drain records the failure instead of
    // poisoning an unrelated statement (the Delta commit it mirrors
    // already succeeded — UniForm conversion is async by contract)
    GraftSql.sql(spark, "SELECT 1")
    assert(Uniform.lastSyncError(base)
      .exists(_.getMessage.contains("NOT managed")))
  }

  test("a property-only Delta commit advances the track key without a snapshot") {
    val base = freshBase("proponly")
    DeltaInterop.overwrite((0L until 30L).toDF("id").coalesce(1), base)
    Uniform.enable(spark, base)
    val snapsBefore = IcebergInterop.snapshotIds(base).size
    val manifestsBefore = new File(base, "metadata").list()
      .count(_.startsWith("manifest-"))
    val v = DeltaInterop.setProperties(spark, base,
      Map("graft.test.note" -> "x"))
    Uniform.sync(spark, base)
    // tracked, but via a metadata-only version — no empty append
    // snapshot, no empty manifest
    assert(trackedVersion(base) == v)
    assert(IcebergInterop.snapshotIds(base).size == snapsBefore)
    assert(new File(base, "metadata").list()
      .count(_.startsWith("manifest-")) == manifestsBefore)
    assert(IcebergInterop.read(spark, base).count() == 30L)
  }

  test("the streaming Delta sink maintains the Iceberg mirror per batch") {
    val base = freshBase("streamsink")
    val df0 = (0L until 10L).toDF("id")
    // nullable creation schema: streamed batches arrive nullable
    DeltaInterop.overwrite(spark.createDataFrame(df0.rdd,
      org.apache.spark.sql.types.StructType(
        df0.schema.fields.map(_.copy(nullable = true)))).coalesce(1), base)
    Uniform.enable(spark, base)
    val srcDir = freshBase("streamsink_src")
    spark.range(100, 140).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    graft.streaming.EventStreams.streamIngestDelta(
      spark.readStream.schema("id LONG").parquet(srcDir), base)
    // NO manual Uniform.sync anywhere — the sink's per-batch tick
    // kept the mirror current
    assert(trackedVersion(base) ==
      DeltaInterop.snapshot(spark, base).version)
    assert(sortedRows(IcebergInterop.read(spark, base).select("id")) ==
           sortedRows(DeltaInterop.read(spark, base).select("id")))
    assert(IcebergInterop.read(spark, base).count() == 50L)
  }

  test("VACUUM never enters a stale mirror after UniForm is disabled") {
    val base = freshBase("vacstale")
    DeltaInterop.overwrite((0L until 50L).toDF("id").coalesce(1), base)
    Uniform.enable(spark, base)
    // a full rewrite tombstones the original files — bait for vacuum
    DeltaInterop.overwrite((50L until 100L).toDF("id").coalesce(1), base)
    Uniform.sync(spark, base)
    val mirrorFiles = new File(base, "metadata").list().toSet
    // disable UniForm: the property goes away but the mirror stays on
    // disk — vacuum must STILL refuse to walk metadata/ and data/, or
    // it deletes manifests piecemeal and corrupts the abandoned mirror
    DeltaInterop.setProperties(spark, base, Map(Uniform.PropKey -> ""))
    val reclaimed = DeltaInterop.vacuum(spark, base, retainMillis = 0L)
    assert(!reclaimed.exists(p =>
      p.startsWith("metadata/") || p.startsWith("data/")))
    assert(new File(base, "metadata").list().toSet == mirrorFiles)
    // the (stale but uncorrupted) mirror still reads its last sync
    assert(IcebergInterop.read(spark, base).count() == 50L)
  }
}
