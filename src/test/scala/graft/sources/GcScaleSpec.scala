package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Distributed GC. At 100 TB a table root holds 10⁶–10⁷ files; a
  * driver-recursive VACUUM / remove_orphan_files walk serializes the
  * listing and pins every path in driver memory. Above
  * `graft.gc.fanout` both GCs run listing, reachability, the
  * orphan anti-join and the deletes as Spark jobs. These tests pin
  * (a) the fan-out path reclaims EXACTLY what the driver walk
  * reclaims (dry-run list equality), (b) a Spark job actually runs
  * above the threshold and none below, and (c) the at-scale paths
  * physically delete the right files and nothing else. */
class GcScaleSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("gc_scale_").toFile
    d.deleteOnExit(); d.getPath
  }

  /** Count Spark jobs submitted while `body` runs. */
  private def jobsDuring[A](body: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      val bus = spark.sparkContext.getClass
        .getMethod("listenerBus").invoke(spark.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      (r, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def withFanout[A](n: Int)(body: => A): A = {
    spark.conf.set("graft.gc.fanout", n.toString)
    try body finally spark.conf.unset("graft.gc.fanout")
  }

  // ------------------------------------------------------------- Delta

  /** A Delta table with tombstoned files (two generations) plus true
    * orphans (never logged), nested one deep like a partition dir. */
  private def buildDeltaGcTable(): String = {
    val base = tmp()
    DeltaInterop.overwrite(
      (0L until 80L).toDF("id").repartition(8), base)
    DeltaInterop.overwrite(
      (80L until 160L).toDF("id").repartition(8), base)
    Files.writeString(new File(base, "stray.parquet").toPath, "junk")
    val junkDir = new File(base, "junk"); junkDir.mkdirs()
    Files.writeString(new File(junkDir, "stray2.bin").toPath, "junk")
    base
  }

  test("Delta VACUUM: fan-out dry-run reclaims exactly the driver walk's list") {
    val base = buildDeltaGcTable()
    val driverList = withFanout(1000000)(
      DeltaInterop.vacuum(spark, base, retainMillis = 0L, dryRun = true))
    val (fanList, fanJobs) = jobsDuring(withFanout(1)(
      DeltaInterop.vacuum(spark, base, retainMillis = 0L, dryRun = true)))
    assert(fanJobs >= 1, "fan-out VACUUM must run as a Spark job")
    assert(driverList.nonEmpty)
    assert(fanList == driverList)
    // the tombstoned generation + both strays are all in the plan
    assert(driverList.contains("stray.parquet"))
    assert(driverList.contains("junk/stray2.bin"))
    assert(driverList.count(_.endsWith(".parquet")) >= 9)
  }

  test("Delta VACUUM below the threshold stays a driver walk (no job)") {
    val base = buildDeltaGcTable()
    val (_, jobs) = jobsDuring(
      DeltaInterop.vacuum(spark, base, retainMillis = 0L, dryRun = true))
    assert(jobs == 0, s"a 8-file table must not submit a job (got $jobs)")
  }

  test("Delta VACUUM fan-out deletes orphans, keeps live files, prunes emptied dirs") {
    val base = buildDeltaGcTable()
    val liveBefore = DeltaInterop.snapshot(spark, base).files.map(_.path).toSet
    val reclaimed = withFanout(1)(
      DeltaInterop.vacuum(spark, base, retainMillis = 0L))
    assert(reclaimed.contains("stray.parquet"))
    assert(!new File(base, "stray.parquet").exists())
    assert(!new File(base, "junk").exists(), "emptied dir must be pruned")
    // live files untouched; the table still reads its current state
    assert(DeltaInterop.snapshot(spark, base).files.map(_.path).toSet
      == liveBefore)
    assert(DeltaInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (80L until 160L).sum)
    // a second vacuum finds nothing (idempotent)
    assert(withFanout(1)(
      DeltaInterop.vacuum(spark, base, retainMillis = 0L)).isEmpty)
  }

  test("Delta VACUUM fan-out honors tombstone-commit retention clocks") {
    val base = tmp()
    DeltaInterop.overwrite((0L until 40L).toDF("id").coalesce(1), base)
    DeltaInterop.overwrite((40L until 80L).toDF("id").coalesce(1), base)
    // retention window longer than any mtime age: tombstoned files
    // survive on BOTH paths (time travel inside the window keeps
    // working), orphans with old mtimes would not
    val driverList = withFanout(1000000)(DeltaInterop.vacuum(
      spark, base, retainMillis = 3600L * 1000, dryRun = true))
    val fanList = withFanout(1)(DeltaInterop.vacuum(
      spark, base, retainMillis = 3600L * 1000, dryRun = true))
    assert(driverList.isEmpty)
    assert(fanList == driverList)
  }

  // ----------------------------------------------------------- Iceberg

  /** An Iceberg table (two snapshots) plus stray files under data/
    * and the root. */
  private def buildIcebergGcTable(): String = {
    val base = tmp()
    IcebergInterop.overwrite((0L until 60L).toDF("id").repartition(4), base)
    IcebergInterop.append((60L until 90L).toDF("id").repartition(2), base)
    Files.writeString(new File(base, "stray-root.bin").toPath, "junk")
    val dataDir = new File(base, "data")
    if (!dataDir.exists()) dataDir.mkdirs()
    Files.writeString(new File(dataDir, "orphan.parquet").toPath, "junk")
    base
  }

  test("Iceberg remove_orphan_files: fan-out dry-run ≡ driver crawl") {
    val base = buildIcebergGcTable()
    val cutoff = Some(System.currentTimeMillis() + 60000L)
    val driverList = withFanout(1000000)(
      IcebergInterop.removeOrphanFiles(spark, base, cutoff, dryRun = true))
    val (fanList, fanJobs) = jobsDuring(withFanout(1)(
      IcebergInterop.removeOrphanFiles(spark, base, cutoff, dryRun = true)))
    assert(fanJobs >= 1, "fan-out orphan removal must run as a Spark job")
    assert(driverList.contains("stray-root.bin"))
    assert(driverList.contains("data/orphan.parquet"))
    assert(fanList == driverList)
    // reachability held: no live data file, manifest, manifest list or
    // metadata json is in the reclaim plan
    assert(!driverList.exists(_.startsWith("metadata/")))
  }

  test("Iceberg remove_orphan_files below the threshold stays a driver crawl") {
    val base = buildIcebergGcTable()
    val cutoff = Some(System.currentTimeMillis() + 60000L)
    val (_, jobs) = jobsDuring(
      IcebergInterop.removeOrphanFiles(spark, base, cutoff, dryRun = true))
    assert(jobs == 0, s"a 6-file table must not submit a job (got $jobs)")
  }

  test("Iceberg remove_orphan_files fan-out deletes orphans, table intact") {
    val base = buildIcebergGcTable()
    val cutoff = Some(System.currentTimeMillis() + 60000L)
    val reclaimed = withFanout(1)(
      IcebergInterop.removeOrphanFiles(spark, base, cutoff))
    assert(reclaimed.contains("stray-root.bin"))
    assert(!new File(base, "stray-root.bin").exists())
    assert(!new File(base, "data/orphan.parquet").exists())
    assert(IcebergInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 90L).sum)
    // time travel to the first snapshot still works — reachability
    // across ALL metadata versions protected its files
    val firstSnap = IcebergInterop.snapshotIds(base).head
    assert(IcebergInterop.read(spark, base, snapshotId = Some(firstSnap))
      .count() == 60L)
  }

  test("expire_snapshots fan-out reclaims exactly the driver crawl's list") {
    // two IDENTICAL tables (expire mutates): driver-mode on one,
    // fan-out on the other — reclaim lists and surviving state match
    def build(): String = {
      val base = tmp()
      IcebergInterop.overwrite((0L until 40L).toDF("id").repartition(4), base)
      IcebergInterop.append((40L until 60L).toDF("id").repartition(2), base)
      IcebergInterop.overwrite((100L until 130L).toDF("id").repartition(3), base)
      base
    }
    val a = build()
    val b = tmp()
    new File(b).delete()
    org.apache.commons.io.FileUtils.copyDirectory(new File(a), new File(b))
    val driverList = withFanout(1000000)(
      IcebergInterop.expireSnapshots(spark, a))
    val (fanList, fanJobs) = jobsDuring(withFanout(1)(
      IcebergInterop.expireSnapshots(spark, b)))
    assert(fanJobs >= 1, "fan-out expire must run as a Spark job")
    assert(driverList.nonEmpty)
    assert(fanList == driverList)
    assert(IcebergInterop.read(spark, b).agg(sum("id")).head().getLong(0)
      == (100L until 130L).sum)
    assert(IcebergInterop.snapshotIds(b).size == 1)
  }

  test("remove_orphan_files never reaps a Delta mirror's _delta_log") {
    val base = tmp()
    IcebergInterop.overwrite((0L until 30L).toDF("id").coalesce(1), base)
    DeltaMirror.enable(spark, base)
    val cutoff = Some(System.currentTimeMillis() + 60000L)
    for (fan <- Seq(1, 1000000)) {
      val list = withFanout(fan)(
        IcebergInterop.removeOrphanFiles(spark, base, cutoff, dryRun = true))
      assert(!list.exists(_.startsWith("_delta_log")),
        s"fanout=$fan reclaim plan entered the Delta mirror's log: $list")
    }
    // the mirror still reads after a REAL orphan pass
    withFanout(1)(IcebergInterop.removeOrphanFiles(spark, base, cutoff))
    assert(DeltaInterop.read(spark, base).count() == 30L)
  }
}
