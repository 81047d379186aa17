package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Executor-parallel metadata planning. At 100 TB a table holds
  * thousands of manifests / commit JSONs; decoding them one-by-one on
  * the driver serializes planning on a single node. Above a threshold
  * the per-manifest avro decode (Iceberg) and the commit-tail fetch
  * (Delta) run as a Spark job. These tests pin (a) the fan-out path
  * produces planning state IDENTICAL to the driver walk, and (b) a job
  * actually runs (it is not a driver loop in disguise).
  *
  * The fixtures are hand-crafted metadata (1,000 manifests / 200
  * commits built directly, not via 1,000 commits) — snapshot() never
  * opens data files, so planning is testable without them. */
class ManifestScaleSpec extends graft.SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("manifest_scale_").toFile
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
      // listener bus is async; drain before reading the counter
      // (listenerBus is private[spark] at the Scala level but public
      // in bytecode — reflection reaches it)
      val bus = spark.sparkContext.getClass
        .getMethod("listenerBus").invoke(spark.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      (r, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  // ------------------------------------------------------------ Iceberg

  private val entrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"snapshot_id","type":["null","long"],"default":null},
      {"name":"sequence_number","type":["null","long"],"default":null},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        {"name":"record_count","type":"long"}]}}]}""")

  private val listSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"content","type":"int"},
      {"name":"sequence_number","type":"long"},
      {"name":"first_row_id","type":["null","long"],"default":null}]}""")

  /** A table whose current snapshot references `n` data manifests, two
    * entries each; odd manifests carry first_row_id (exercising the
    * per-manifest row-id inheritance on whichever path decodes them). */
  private def buildIcebergTable(n: Int): String = {
    val base = tmp()
    val metaDir = new File(base, "metadata"); metaDir.mkdirs()
    (0 until n).foreach { i =>
      val mFile = new File(metaDir, f"m$i%05d.avro")
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](entrySchema))
      w.create(entrySchema, mFile)
      (0 until 2).foreach { j =>
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1)
        e.put("snapshot_id", (i % 7 + 1).toLong)
        // half the entries inherit the manifest's sequence number
        if (j == 0) e.put("sequence_number", (i + 100).toLong)
        val dfr = new GenericData.Record(entrySchema.getField("data_file").schema())
        dfr.put("file_path", s"$base/data/f$i-$j.parquet")
        dfr.put("file_format", "PARQUET")
        dfr.put("record_count", (10 + j).toLong)
        e.put("data_file", dfr)
        w.append(e)
      }
      w.close()
    }
    val mlFile = new File(metaDir, "snap-1.avro")
    val w2 = new DataFileWriter(new GenericDatumWriter[GenericRecord](listSchema))
    w2.create(listSchema, mlFile)
    (0 until n).foreach { i =>
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", new File(metaDir, f"m$i%05d.avro").getAbsolutePath)
      r.put("content", 0)
      r.put("sequence_number", (i + 1).toLong)
      if (i % 2 == 1) r.put("first_row_id", i * 1000L)
      w2.append(r)
    }
    w2.close()
    Files.writeString(new File(metaDir, "v1.metadata.json").toPath,
      s"""{"format-version":2,"table-uuid":"t","location":"$base",
          "last-sequence-number":$n,"last-updated-ms":0,"last-column-id":1,
          "current-schema-id":0,
          "schemas":[{"type":"struct","schema-id":0,"fields":[
            {"id":1,"name":"id","required":false,"type":"long"}]}],
          "default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
          "last-partition-id":999,"default-sort-order-id":0,"sort-orders":[],
          "current-snapshot-id":1,
          "snapshots":[{"snapshot-id":1,"sequence-number":$n,"timestamp-ms":0,
            "manifest-list":"${mlFile.getAbsolutePath}",
            "summary":{"operation":"append"},"schema-id":0}]}""")
    Files.writeString(new File(metaDir, "version-hint.text").toPath, "1")
    base
  }

  test("Iceberg: 1k-manifest planning fans over executors, " +
       "identical to the driver walk") {
    val base = buildIcebergTable(1000)
    // driver walk: threshold above the manifest count
    spark.conf.set("graft.iceberg.manifestFanout", "1000000")
    val (driverSnap, _) =
      try jobsDuring(IcebergInterop.snapshot(spark, base))
      finally spark.conf.unset("graft.iceberg.manifestFanout")
    // fan-out: default threshold (64) — 1000 manifests trigger the job
    val (fanSnap, fanJobs) = jobsDuring(IcebergInterop.snapshot(spark, base))
    assert(fanJobs >= 1, "fan-out planning must run as a Spark job")
    assert(fanSnap.files.size == 2000)
    // planning state identical, including order, inherited sequence
    // numbers, row-id inheritance, and adding-snapshot attribution
    def key(f: IcebergInterop.DataFileEntry) =
      (f.path, f.rawPath, f.seq, f.recordCount, f.firstRowId,
       f.addedSnapshotId)
    assert(fanSnap.files.map(key) == driverSnap.files.map(key))
    assert(fanSnap.schema == driverSnap.schema)
    // row-id inheritance spot check: odd manifest i, entries inherit
    // first_row_id i*1000 then i*1000+10 (first entry's record_count)
    val m1 = fanSnap.files.filter(_.path.contains("/f1-"))
    assert(m1.map(_.firstRowId) == Seq(Some(1000L), Some(1010L)))
    val m2 = fanSnap.files.filter(_.path.contains("/f2-"))
    assert(m2.map(_.firstRowId) == Seq(None, None))
  }

  test("Iceberg: below the threshold, planning stays a driver walk (no job)") {
    val base = buildIcebergTable(8)
    val (snap, jobs) = jobsDuring(IcebergInterop.snapshot(spark, base))
    assert(jobs == 0, s"8 manifests must not submit a job (got $jobs)")
    assert(snap.files.size == 16)
  }

  // -------------------------------------------------------------- Delta

  /** A log of `n` commits: v0 protocol+metaData+add, then one add per
    * version; `removeAt` removes the file added at version 5 (ordered
    * apply: the fan-out fetch must not reorder reconciliation). */
  private def buildDeltaTable(n: Int, removeAt: Long = -1L): String = {
    val base = tmp()
    val dir = new File(base, "_delta_log"); dir.mkdirs()
    val schemaString =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
    Files.writeString(new File(dir, f"${0L}%020d.json").toPath,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"t0","schemaString":"$schemaString","partitionColumns":[],"configuration":{}}}
         |{"add":{"path":"part-0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    (1L until n).foreach { v =>
      val actions = new StringBuilder()
      actions ++= s"""{"add":{"path":"part-$v.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
                     |""".stripMargin
      if (v == removeAt)
        actions ++= s"""{"remove":{"path":"part-5.parquet","dataChange":true}}
                       |""".stripMargin
      Files.writeString(new File(dir, f"$v%020d.json").toPath,
        actions.toString)
    }
    base
  }

  test("Delta: 200-commit tail replay fans the fetch over executors, " +
       "identical to the driver loop") {
    val base = buildDeltaTable(200, removeAt = 150L)
    spark.conf.set("graft.delta.logFanout", "1000000")
    val (driverSnap, _) =
      try jobsDuring(DeltaInterop.snapshot(spark, base))
      finally spark.conf.unset("graft.delta.logFanout")
    val (fanSnap, fanJobs) = jobsDuring(DeltaInterop.snapshot(spark, base))
    assert(fanJobs >= 1, "fan-out replay must run as a Spark job")
    assert(fanSnap.version == driverSnap.version)
    assert(fanSnap.files.map(_.path) == driverSnap.files.map(_.path))
    assert(fanSnap.schema == driverSnap.schema)
    // ordered apply held: the v5 add was reconciled away by the v150
    // remove even though the fetch was parallel
    assert(!fanSnap.files.exists(_.path == "part-5.parquet"))
    assert(fanSnap.files.size == 199)
  }

  test("Delta: short tails stay a driver loop (no job)") {
    val base = buildDeltaTable(5)
    val (snap, jobs) = jobsDuring(DeltaInterop.snapshot(spark, base))
    assert(jobs == 0, s"5 commits must not submit a job (got $jobs)")
    assert(snap.files.size == 5)
  }

  test("Iceberg: defaulted-column footer presence fans over executors, " +
       "flags identical to the driver reads") {
    import org.apache.spark.sql.functions.{col, sum}
    import spark.implicits._
    val base = tmp()
    // pre-add files (schema proof decides: column absent) ...
    IcebergInterop.overwrite(
      (0L until 40L).toDF("id").repartition(4), base, formatVersion = 3)
    IcebergInterop.addColumn(base, "score",
      org.apache.spark.sql.types.DoubleType, default = Some(1.5))
    // ... and post-add files (footer reads decide: column present)
    IcebergInterop.append(
      (40L until 60L).map(k => (k, k * 2.0)).toDF("id", "score")
        .repartition(2), base)
    def totals() = IcebergInterop.read(spark, base)
      .agg(sum(col("score"))).head().getDouble(0)
    val expect = 40 * 1.5 + (40L until 60L).map(_ * 2.0).sum
    // driver path (threshold above the file count)
    spark.conf.set("graft.iceberg.manifestFanout", "1000000")
    val driverTotal = try totals()
      finally spark.conf.unset("graft.iceberg.manifestFanout")
    // fan-out path (threshold below): identical fill, and the footer
    // reads actually run as a Spark job
    spark.conf.set("graft.iceberg.manifestFanout", "1")
    val (fanTotal, jobs) = try jobsDuring(totals())
      finally spark.conf.unset("graft.iceberg.manifestFanout")
    assert(jobs >= 1, "footer fan-out must run as a Spark job")
    assert(math.abs(driverTotal - expect) < 1e-9)
    assert(fanTotal == driverTotal)
  }
}
