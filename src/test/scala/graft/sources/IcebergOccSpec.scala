package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Iceberg optimistic-concurrency reconciliation: an append that loses
  * the metadata version race REBASES — the same staged data files
  * republish chained onto the winner's head (Iceberg's own
  * SnapshotProducer retry contract) — while a race lost to a
  * schema/partition-spec change refuses loudly. The race is injected
  * deterministically: a TableIO proxy runs a full competing commit the
  * moment the victim reaches its metadata claim. */
class IcebergOccSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("iceocc_").toFile
    d.deleteOnExit(); d.getPath
  }

  /** Delegate everything; run `inject` once, right before the first
    * metadata-version claim. */
  private final class RaceInjector(inject: () => Unit) extends TableIO {
    private val under = LocalTableIO
    @volatile private var injected = false
    def exists(p: String) = under.exists(p)
    def isDirectory(p: String) = under.isDirectory(p)
    def list(d: String) = under.list(d)
    def length(p: String) = under.length(p)
    def lastModified(p: String) = under.lastModified(p)
    def mkdirs(d: String) = under.mkdirs(d)
    def readBytes(p: String) = under.readBytes(p)
    def readString(p: String) = under.readString(p)
    def readLines(p: String) = under.readLines(p)
    def writeBytes(p: String, b: Array[Byte]) = under.writeBytes(p, b)
    def putIfAbsent(s: String, d: String) = {
      if (!injected && d.endsWith(".metadata.json")) {
        injected = true
        inject() // the competing writer wins this version
      }
      under.putIfAbsent(s, d)
    }
    def mirror(s: String, d: String) = under.mirror(s, d)
    def moveReplace(s: String, d: String) = under.moveReplace(s, d)
    def move(s: String, d: String) = under.move(s, d)
    def delete(p: String) = under.delete(p)
    def deleteRecursively(p: String) = under.deleteRecursively(p)
  }

  private def withInjector[A](inject: () => Unit)(body: => A): A = {
    val prior = TableIO.current
    TableIO.current = new RaceInjector(inject)
    try body finally TableIO.current = prior
  }

  test("two interleaved disjoint appends both land") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    withInjector(() =>
      IcebergInterop.append(
        spark.range(100, 105).toDF("id").coalesce(1), base)) {
      IcebergInterop.append(spark.range(10, 15).toDF("id").coalesce(1), base)
    }
    val got = IcebergInterop.read(spark, base)
    assert(got.count() == 20)
    assert(got.agg(sum("id")).head().getLong(0) ==
      (0L until 15L).sum + (100L until 105L).sum)
    // both commits are real snapshots: base(1) + winner(2) + rebased(3)
    assert(IcebergInterop.snapshotsTable(spark, base).count() == 3)
  }

  test("append racing a partition-spec change refuses (no blind rebase)") {
    val base = tmp()
    IcebergInterop.overwrite(
      spark.range(10).select(col("id"), (col("id") % 3).cast("int").as("b")),
      base)
    val e = intercept[java.util.ConcurrentModificationException] {
      withInjector(() =>
        IcebergInterop.evolveSpec(spark, base,
          Seq("b" -> (IcebergInterop.IceTransform.Identity:
            IcebergInterop.IceTransform)))) {
        IcebergInterop.append(
          spark.range(10, 15).select(col("id"),
            (col("id") % 3).cast("int").as("b")).coalesce(1), base)
      }
    }
    assert(e.getMessage.contains("schema or partition-spec change"))
    // the winner's spec evolution is intact; no half-landed append
    assert(IcebergInterop.read(spark, base).count() == 10)
  }

  test("rewriteDataFiles racing a disjoint append rebases — both land") {
    // concurrent maintenance + ingest is the NORMAL state of a large
    // table: the compaction loses the metadata version race, re-carries
    // the winner's head manifests (the append rides along) and
    // republishes the SAME replacement files at the next version —
    // Iceberg's SnapshotProducer retry contract
    val base = tmp()
    IcebergInterop.overwrite(spark.range(6).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(6, 12).toDF("id").coalesce(1), base)
    withInjector(() =>
      IcebergInterop.append(
        spark.range(100, 105).toDF("id").coalesce(1), base)) {
      IcebergInterop.rewriteDataFiles(spark, base)
    }
    val got = IcebergInterop.read(spark, base)
    assert(got.count() == 17)
    assert(got.agg(sum("id")).head().getLong(0) ==
      (0L until 12L).sum + (100L until 105L).sum)
    // the compaction really landed: the two small inputs collapsed into
    // one replacement, and the winner's appended file survives beside it
    val files = IcebergInterop.snapshot(spark, base).files
    assert(files.size == 2, s"expected replacement + winner, got $files")
    // all three commits are real snapshots: base(2) + winner + rebased
    assert(IcebergInterop.snapshotsTable(spark, base).count() == 4)
  }

  test("rewriteDataFiles racing a conflicting rewrite refuses") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(6).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(6, 12).toDF("id").coalesce(1), base)
    val e = intercept[java.util.ConcurrentModificationException] {
      withInjector(() => IcebergInterop.rewriteDataFiles(spark, base)) {
        IcebergInterop.rewriteDataFiles(spark, base)
      }
    }
    assert(e.getMessage.contains("conflicting") ||
      e.getMessage.contains("removed or rewrote"))
    // the winner's compaction is the table state, value-intact
    val got = IcebergInterop.read(spark, base)
    assert(got.count() == 12)
    assert(IcebergInterop.snapshot(spark, base).files.size == 1)
  }

  test("position delete racing a disjoint append rebases — both land") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    withInjector(() =>
      IcebergInterop.append(
        spark.range(100, 105).toDF("id").coalesce(1), base)) {
      IcebergInterop.deletePositionsWhere(spark, base, col("id") < 4)
    }
    val got = IcebergInterop.read(spark, base)
    assert(got.count() == 11)
    assert(got.agg(sum("id")).head().getLong(0) ==
      (4L until 10L).sum + (100L until 105L).sum)
  }

  test("position delete racing a rewrite of its target refuses") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(6).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(6, 12).toDF("id").coalesce(1), base)
    val e = intercept[java.util.ConcurrentModificationException] {
      withInjector(() => IcebergInterop.rewriteDataFiles(spark, base)) {
        IcebergInterop.deletePositionsWhere(spark, base, col("id") < 4)
      }
    }
    assert(e.getMessage.contains("referenced data file"))
    // the winner's compaction is intact; no rows vanished
    assert(IcebergInterop.read(spark, base).count() == 12)
  }

  test("equality-delete merge racing an append rebases serializably") {
    // merge-on-read upserts are keyed: the rebased equality delete's
    // higher sequence retires even rows the WINNER appended under a
    // merge key, and the merge row replaces them — exactly the serial
    // append-then-merge outcome
    val base = tmp()
    IcebergInterop.overwrite(
      spark.range(5).select(col("id"), (col("id") * 10).as("v"))
        .coalesce(1), base)
    withInjector(() =>
      IcebergInterop.append(
        spark.createDataFrame(Seq((2L, 999L), (100L, 1000L)))
          .toDF("id", "v").coalesce(1), base)) {
      IcebergInterop.mergeUpsert(spark, base,
        spark.createDataFrame(Seq((2L, -2L), (50L, -50L))).toDF("id", "v"),
        Seq("id"))
    }
    val got = IcebergInterop.read(spark, base)
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSeq.sorted
    // winner's disjoint row (100) lands; winner's id=2 row is RETIRED
    // by the rebased merge (serial order: append, then merge)
    assert(got == Seq((0L, 0L), (1L, 10L), (2L, -2L), (3L, 30L),
      (4L, 40L), (50L, -50L), (100L, 1000L)), got.toString)
  }

  test("copy-on-write UPDATE racing an append rebases at snapshot isolation") {
    val base = tmp()
    IcebergInterop.overwrite(
      spark.range(6).select(col("id"), (col("id") * 10).as("v"))
        .coalesce(1), base)
    withInjector(() =>
      IcebergInterop.append(
        spark.createDataFrame(Seq((1L, 777L))).toDF("id", "v")
          .coalesce(1), base)) {
      IcebergInterop.updateWhere(spark, base, col("id") < 3,
        Map("v" -> lit(-1L)))
    }
    val got = IcebergInterop.read(spark, base)
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSeq.sorted
    // snapshot isolation: the update's census ran against the OLD
    // snapshot, so the winner's (1, 777) row — though it matches the
    // predicate — is NOT updated (Iceberg's isolation-level=snapshot
    // contract); the old rows updated, survivors intact, winner lands
    assert(got == Seq((0L, -1L), (1L, -1L), (1L, 777L), (2L, -1L),
      (3L, 30L), (4L, 40L), (5L, 50L)), got.toString)
  }

  test("copy-on-write UPDATE racing a rewrite of its input refuses") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(6)
      .select(col("id"), (col("id") * 10).as("v")).coalesce(1), base)
    IcebergInterop.append(spark.range(6, 12)
      .select(col("id"), (col("id") * 10).as("v")).coalesce(1), base)
    val e = intercept[java.util.ConcurrentModificationException] {
      withInjector(() => IcebergInterop.rewriteDataFiles(spark, base)) {
        IcebergInterop.updateWhere(spark, base, col("id") < 3,
          Map("v" -> lit(-1L)))
      }
    }
    assert(e.getMessage.contains("removed or rewrote"))
    assert(IcebergInterop.read(spark, base).count() == 12)
  }

  test("overwrite losing the race refuses (would erase the winner)") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    intercept[java.util.ConcurrentModificationException] {
      withInjector(() =>
        IcebergInterop.append(
          spark.range(100, 105).toDF("id").coalesce(1), base)) {
        IcebergInterop.overwrite(
          spark.range(50, 60).toDF("id").coalesce(1), base)
      }
    }
    // the winner's append is the table state
    assert(IcebergInterop.read(spark, base).count() == 15)
  }
}
