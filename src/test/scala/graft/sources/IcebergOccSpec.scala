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
