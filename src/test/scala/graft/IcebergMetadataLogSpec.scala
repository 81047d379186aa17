package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop

/** Metadata-log, snapshot-log and bounded metadata retention (Iceberg
  * spec §Table Metadata). At 100 TB a table commits thousands of times
  * — an unbounded vN.metadata.json chain is real storage and listing
  * cost, and timestamp time travel needs the snapshot-id history the
  * snapshot-log records. */
class IcebergMetadataLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("ice_mlog_").toFile
    d.deleteOnExit(); d.getPath
  }

  private def meta(base: String): com.fasterxml.jackson.databind.JsonNode = {
    val v = Files.readString(
      new File(base, "metadata/version-hint.text").toPath).trim
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(Files.readString(
        new File(base, s"metadata/v$v.metadata.json").toPath))
  }

  test("metadata-log records predecessors newest-last; snapshot-log " +
       "tracks every current-snapshot change") {
    val base = tmp()
    IcebergInterop.withClock(IcebergInterop.tickingClock(1000L, 1000L)) {
      IcebergInterop.overwrite(spark.range(4).toDF("id").coalesce(1), base)
      IcebergInterop.append(spark.range(4, 6).toDF("id").coalesce(1), base)
      IcebergInterop.append(spark.range(6, 8).toDF("id").coalesce(1), base)
    }
    val m = meta(base)
    val mlog = m.get("metadata-log")
    assert(mlog.size() == 2, s"3 commits -> 2 predecessors, got ${mlog.size()}")
    assert((0 until mlog.size()).map(i =>
      mlog.get(i).get("metadata-file").asText().split("/").last) ==
      Seq("v1.metadata.json", "v2.metadata.json"))
    val slog = m.get("snapshot-log")
    assert(slog.size() == 3)
    val ids = (0 until 3).map(i => slog.get(i).get("snapshot-id").asLong())
    assert(ids == Seq(1L, 2L, 3L))
    val ts = (0 until 3).map(i => slog.get(i).get("timestamp-ms").asLong())
    assert(ts == ts.sorted && ts.distinct.size == 3)
  }

  test("TIMESTAMP AS OF resolves through the snapshot-log; rollback " +
       "appends an entry; expire trims dead ids") {
    val base = tmp()
    IcebergInterop.withClock(IcebergInterop.tickingClock(10000L, 1000L)) {
      IcebergInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base)
      IcebergInterop.append(spark.range(5, 9).toDF("id").coalesce(1), base)
      IcebergInterop.append(spark.range(9, 11).toDF("id").coalesce(1), base)
    }
    val slog0 = meta(base).get("snapshot-log")
    val t2 = slog0.get(1).get("timestamp-ms").asLong() // snapshot 2 current
    val sidAtT2 = IcebergInterop.snapshotIdAtTimestamp(base, t2)
    assert(sidAtT2 == 2L)
    assert(IcebergInterop.read(spark, base, snapshotId = Some(sidAtT2))
      .count() == 9)
    // before the first entry → loud refusal
    intercept[IllegalArgumentException](
      IcebergInterop.snapshotIdAtTimestamp(base, 1L))
    // rollback: the log gains a NEW entry naming the old id
    IcebergInterop.rollbackTo(base, 2L)
    val slog1 = meta(base).get("snapshot-log")
    assert(slog1.get(slog1.size() - 1).get("snapshot-id").asLong() == 2L)
    // expire: entries for reclaimed snapshots leave the log
    IcebergInterop.append(spark.range(20, 22).toDF("id").coalesce(1), base)
    IcebergInterop.expireSnapshots(spark, base, retainLast = 1)
    val live = (0 until meta(base).get("snapshots").size())
      .map(i => meta(base).get("snapshots").get(i).get("snapshot-id").asLong())
      .toSet
    val slog2 = meta(base).get("snapshot-log")
    (0 until slog2.size()).foreach { i =>
      assert(live.contains(slog2.get(i).get("snapshot-id").asLong()),
        "snapshot-log kept an entry for an expired snapshot")
    }
  }

  test("after a ROLLBACK, TIMESTAMP AS OF sees what a reader at that " +
       "time saw — the snapshot-log, not snapshot recency, decides") {
    val base = tmp()
    IcebergInterop.withClock(IcebergInterop.tickingClock(1000L, 1000L)) {
      IcebergInterop.overwrite(spark.range(4).toDF("id").coalesce(1), base) // @1000, snap 1
      IcebergInterop.append(spark.range(4, 9).toDF("id").coalesce(1), base) // @2000, snap 2
      IcebergInterop.rollbackTo(base, 1L)                                   // @3000 (or later)
    }
    // at t=5000 the CURRENT table is snapshot 1 (4 rows); resolving by
    // "newest snapshot <= ts" would wrongly return snapshot 2 (9 rows)
    assert(IcebergInterop.snapshotIdAsOf(base, 5000L) == 1L)
    assert(IcebergInterop.readAsOfTimestamp(spark, base, 5000L).count() == 4)
    // before the rollback, at t=2500, readers saw snapshot 2
    assert(IcebergInterop.snapshotIdAsOf(base, 2500L) == 2L)
    // the history metadata table shows the rollback as its OWN row
    val hist = IcebergInterop.historyTable(spark, base)
      .orderBy("made_current_at_ms").collect()
    assert(hist.map(_.getLong(1)).toSeq == Seq(1L, 2L, 1L),
      "history must show snapshot 1 made current AGAIN by the rollback")
    assert(hist.map(_.getBoolean(2)).toSeq == Seq(false, false, true))
  }

  test("delete-after-commit reclaims metadata versions beyond the " +
       "window; the table stays fully readable") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(3).toDF("id").coalesce(1), base)
    IcebergInterop.setTableProperties(base, Map(
      "write.metadata.delete-after-commit.enabled" -> "true",
      "write.metadata.previous-versions-max" -> "3"))
    (0 until 6).foreach(i =>
      IcebergInterop.append(
        spark.range(10 * i, 10 * i + 2).toDF("id").coalesce(1), base))
    val metaDir = new File(base, "metadata")
    val versions = metaDir.listFiles()
      .filter(_.getName.matches("v[0-9]+\\.metadata\\.json"))
      .map(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
      .sorted
    // 8 commits total; window 3 predecessors + current = 4 files
    assert(versions.length == 4, s"got versions $versions")
    assert(versions.last == 8 && versions.head == 5)
    // the metadata-log never references a deleted file
    val mlog = meta(base).get("metadata-log")
    (0 until mlog.size()).foreach { i =>
      val f = mlog.get(i).get("metadata-file").asText()
      assert(new File(f).exists(), s"metadata-log references deleted $f")
    }
    assert(IcebergInterop.read(spark, base).count() == 3 + 12)
    // snapshots themselves are untouched — time travel by id still works
    assert(IcebergInterop.read(spark, base, snapshotId = Some(1L))
      .count() == 3)
  }
}
