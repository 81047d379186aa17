package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.DeltaInterop

/** Delta protocol conformance edges the oracle query can't reach:
  * version refusal, null partition values, checkpoint-only replay,
  * remove semantics, and log crafted BY HAND (not by our own writer, so
  * reader and writer bugs can't cancel out). */
class DeltaInteropSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("delta_spec_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("round trip: overwrite + append + read, unpartitioned") {
    val base = tmp()
    val df = spark.range(10).select(col("id"), (col("id") * 2).as("v"))
    DeltaInterop.overwrite(df, base)
    DeltaInterop.append(df.select(col("id") + 100 as "id", col("v")), base)
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 20)
    assert(got.agg(sum("id")).head().getLong(0) == (0 until 10).sum * 2 + 100 * 10)
  }

  test("partition values come from the log, not the data files") {
    val base = tmp()
    val df = spark.range(20).select(col("id"),
      (col("id") % 4).cast("int").as("bucket"))
    DeltaInterop.overwrite(df, base, partitionBy = Seq("bucket"))
    // the data files must NOT contain the partition column
    val dataFiles = DeltaInterop.snapshot(spark, base).files
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val physical = spark.read.parquet(s"$base/${f.path}").schema.fieldNames
      assert(!physical.contains("bucket"), s"partition column leaked into ${f.path}")
      assert(f.partitionValues.keySet == Set("bucket"))
    }
    val got = DeltaInterop.read(spark, base)
    assert(got.schema.fieldNames.toSeq == Seq("id", "bucket"))
    assert(got.where(col("bucket") === 2).count() == 5)
    assert(got.agg(sum("bucket")).head().getLong(0) == (0 until 20).map(_ % 4).sum)
  }

  test("append into a partitioned table inherits the table's partitioning") {
    val base = tmp()
    val df = spark.range(12).select(col("id"),
      (col("id") % 3).cast("int").as("bucket"))
    DeltaInterop.overwrite(df, base, partitionBy = Seq("bucket"))
    // no partitionBy given: append must stage per-partition with
    // partitionValues in the add actions, or the read re-attaches NULLs
    DeltaInterop.append(
      spark.range(100, 106).select(col("id"),
        (col("id") % 3).cast("int").as("bucket")), base)
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 18)
    assert(got.where(col("bucket").isNull).count() == 0)
    assert(got.where(col("id") >= 100).agg(sum("bucket")).head().getLong(0) ==
      (100 until 106).map(_ % 3).sum)
    DeltaInterop.snapshot(spark, base).files.foreach { f =>
      assert(f.partitionValues.keySet == Set("bucket"),
        s"append staged ${f.path} without partition values")
    }
    // an explicitly mismatched layout refuses instead of corrupting
    val err = intercept[IllegalArgumentException] {
      DeltaInterop.append(df, base, partitionBy = Seq("id"))
    }
    assert(err.getMessage.contains("does not match"))
  }

  test("overwrite removes prior files; time travel still sees them") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(5).toDF("id"), base)
    DeltaInterop.overwrite(spark.range(100, 103).toDF("id"), base)
    assert(DeltaInterop.read(spark, base).count() == 3)
    assert(DeltaInterop.read(spark, base, versionAsOf = Some(0L)).count() == 5)
  }

  test("checkpoint + tail replay equals pure JSON replay") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(8).toDF("id"), base)
    DeltaInterop.append(spark.range(8, 16).toDF("id"), base)
    DeltaInterop.checkpoint(spark, base)
    DeltaInterop.append(spark.range(16, 20).toDF("id"), base)
    val viaCp = DeltaInterop.read(spark, base)
    assert(viaCp.count() == 20)
    // delete the checkpoint pointer: pure JSON replay must agree
    assert(new File(s"$base/_delta_log/_last_checkpoint").delete())
    val viaJson = DeltaInterop.read(spark, base)
    assert(viaJson.count() == 20)
    assert(viaCp.agg(sum("id")).head().getLong(0) ==
      viaJson.agg(sum("id")).head().getLong(0))
  }

  test("reader v3: unknown readerFeatures refused, supported ones accepted") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(3).toDF("id"), base)
    // a feature this engine does not implement → protocol-mandated
    // refusal (typeWidening moved OFF this list when widening landed)
    Files.writeString(new File(s"$base/_delta_log/00000000000000000001.json").toPath,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["futureCollations"]}}""" + "\n")
    val e = intercept[IllegalArgumentException](DeltaInterop.read(spark, base))
    assert(e.getMessage.contains("futureCollations"))
    // an implemented feature set → the same table reads fine
    // (vacuumProtocolCheck imposes no read obligation and delta-spark
    // writes it alongside v2Checkpoint — it must not refuse)
    Files.writeString(new File(s"$base/_delta_log/00000000000000000001.json").toPath,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping","timestampNtz","vacuumProtocolCheck"]}}""" + "\n")
    assert(DeltaInterop.read(spark, base).count() == 3)
  }

  test("reads a hand-crafted log (writer not involved)") {
    // craft the table exactly as PROTOCOL.md prescribes, using only
    // parquet writes + hand-written JSON — proves the reader against the
    // spec, not against our own writer
    val base = tmp()
    val log = new File(base, "_delta_log"); log.mkdirs()
    val part = new File(base, "data-0.parquet")
    val df = spark.range(4).select(col("id"), lit("x").as("tag"))
    val scratch = new File(base, ".s")
    df.coalesce(1).write.parquet(scratch.getPath)
    val pf = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(pf.toPath, part.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    val schemaJson = df.schema.json.replace("\"", "\\\"")
    Files.writeString(new File(log, "00000000000000000000.json").toPath,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"t0","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":0}}
         |{"add":{"path":"data-0.parquet","partitionValues":{},"size":${part.length()},"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 4)
    assert(got.schema.fieldNames.toSeq == Seq("id", "tag"))
  }

  test("multi-part classic checkpoint reads as one logical dataset") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(12).toDF("id"), base)
    DeltaInterop.append(spark.range(12, 20).toDF("id"), base)
    DeltaInterop.checkpoint(spark, base)
    // split the single checkpoint into the protocol's k-of-n part form
    val log = new File(base, "_delta_log")
    val single = log.listFiles()
      .find(_.getName.endsWith(".checkpoint.parquet")).get
    val v = single.getName.stripSuffix(".checkpoint.parquet")
    val cp = spark.read.parquet(single.getPath)
    val rows = cp.collect()
    val half = rows.length / 2
    Seq(rows.take(half), rows.drop(half)).zipWithIndex.foreach { case (part, i) =>
      val scratch = new File(base, s".split_$i")
      spark.createDataFrame(
        spark.sparkContext.parallelize(part.toSeq, 1), cp.schema)
        .coalesce(1).write.parquet(scratch.getPath)
      val pf = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(pf.toPath, new File(log,
        f"$v.checkpoint.${i + 1}%010d.${2}%010d.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    }
    assert(single.delete())
    // delete the JSON commits at/below the checkpoint (log retention
    // would) so the state MUST come from the split checkpoint
    log.listFiles().filter(f => f.getName.endsWith(".json") &&
      f.getName.stripSuffix(".json").toLong <= v.toLong).foreach(f =>
        assert(f.delete()))
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 20)
    assert(got.agg(sum("id")).head().getLong(0) == (0 until 20).sum)
  }

  test("v2 checkpoint (UUID-named + sidecars) replays value-exact") {
    // transform our own v1 checkpoint into the protocol's v2 shape —
    // a UUID-named top-level file carrying the non-file actions plus
    // `sidecar` refs, with the add actions in _delta_log/_sidecars/ —
    // then force the state to come from it (the q141 foreign-fixture
    // pattern: proves the reader against the spec, not our writer)
    val base = tmp()
    DeltaInterop.overwrite(spark.range(12).toDF("id"), base)
    DeltaInterop.append(spark.range(12, 20).toDF("id"), base)
    DeltaInterop.checkpoint(spark, base)
    val log = new File(base, "_delta_log")
    val single = log.listFiles()
      .find(_.getName.endsWith(".checkpoint.parquet")).get
    val v = single.getName.stripSuffix(".checkpoint.parquet")
    val cp = spark.read.parquet(single.getPath)
    def stage(df: org.apache.spark.sql.DataFrame, dst: File): Unit = {
      val scratch = new File(base, s".s_${java.util.UUID.randomUUID()}")
      df.coalesce(1).write.parquet(scratch.getPath)
      val pf = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
      dst.getParentFile.mkdirs()
      Files.move(pf.toPath, dst.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    }
    // file actions → one sidecar parquet
    val sidecarName = s"${java.util.UUID.randomUUID()}.parquet"
    val sidecarFile = new File(new File(log, "_sidecars"), sidecarName)
    stage(cp.filter(col("add.path").isNotNull).select(col("add")), sidecarFile)
    // non-file actions + the sidecar ref → the UUID-named top level
    val topName = s"$v.checkpoint.${java.util.UUID.randomUUID()}.parquet"
    val nonFile = cp.filter(col("add.path").isNull).drop("add")
    val sidecarRow = spark.range(1).select(struct(
      lit(sidecarName).as("path"),
      lit(sidecarFile.length()).as("sizeInBytes"),
      lit(0L).as("modificationTime")).as("sidecar"))
    stage(nonFile.unionByName(sidecarRow, allowMissingColumns = true),
      new File(log, topName))
    assert(single.delete())
    // log retention: the state MUST come from the v2 checkpoint
    log.listFiles().filter(f => f.getName.endsWith(".json") &&
      f.getName.stripSuffix(".json").toLong <= v.toLong).foreach(f =>
        assert(f.delete()))
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 20)
    assert(got.agg(sum("id")).head().getLong(0) == (0 until 20).sum)
    // the table stays WRITABLE through the v2-checkpoint snapshot, and
    // the tail replays on top of it
    DeltaInterop.append(spark.range(20, 25).toDF("id"), base)
    assert(DeltaInterop.read(spark, base).count() == 25)
    // a top-level naming a MISSING sidecar refuses rather than reading
    // an incomplete live set
    assert(sidecarFile.delete())
    val e = intercept[IllegalArgumentException](
      DeltaInterop.read(spark, base))
    assert(e.getMessage.contains("sidecar"))
  }

  test("v2 checkpoint with a JSON top-level file replays value-exact") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id"), base)
    DeltaInterop.checkpoint(spark, base)
    val log = new File(base, "_delta_log")
    val single = log.listFiles()
      .find(_.getName.endsWith(".checkpoint.parquet")).get
    val v = single.getName.stripSuffix(".checkpoint.parquet")
    val cp = spark.read.parquet(single.getPath)
    // file actions → sidecar parquet (same shape as the parquet form)
    val sidecarName = s"${java.util.UUID.randomUUID()}.parquet"
    val sidecarFile = new File(new File(log, "_sidecars"), sidecarName)
    val scratch = new File(base, ".s_json")
    cp.filter(col("add.path").isNotNull).select(col("add"))
      .coalesce(1).write.parquet(scratch.getPath)
    sidecarFile.getParentFile.mkdirs()
    Files.move(scratch.listFiles().find(_.getName.endsWith(".parquet")).get
      .toPath, sidecarFile.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    // non-file actions as newline-delimited JSON + the sidecar ref
    val md = DeltaInterop.snapshot(spark, base)
    val schemaJson = md.schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    Files.writeString(new File(log,
      s"$v.checkpoint.${java.util.UUID.randomUUID()}.json").toPath,
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}
         |{"metaData":{"id":"${md.tableId.getOrElse("t")}","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":0}}
         |{"sidecar":{"path":"$sidecarName","sizeInBytes":${sidecarFile.length()},"modificationTime":0}}
         |""".stripMargin)
    assert(single.delete())
    log.listFiles().filter(f => f.getName.endsWith(".json") &&
      f.getName.length == "00000000000000000000.json".length &&
      f.getName.stripSuffix(".json").toLong <= v.toLong).foreach(f =>
        assert(f.delete()))
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 10)
    assert(got.agg(sum("id")).head().getLong(0) == (0 until 10).sum)
  }

  test("checkpointV2 writer: multi-sidecar v2 replay equals pure JSON replay") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(12).toDF("id"), base)
    DeltaInterop.append(spark.range(12, 20).toDF("id").coalesce(1), base)
    // DV descriptors and txn state must survive the v2 checkpoint
    graft.sources.DeltaDml.deleteVectoredWhere(spark, base, col("id") < 3)
    DeltaInterop.appendIdempotent(
      spark.range(20, 22).toDF("id").coalesce(1), base, "app-v2", 4L)
    DeltaInterop.checkpointV2(spark, base, sidecarParts = 2)
    val log = new File(base, "_delta_log")
    assert(new File(log, "_sidecars").listFiles().length == 2)
    DeltaInterop.append(spark.range(22, 25).toDF("id").coalesce(1), base)
    val viaV2 = DeltaInterop.read(spark, base)
    val expect = ((3 until 25).map(_.toLong)).toSet
    assert(viaV2.select("id").collect().map(_.getLong(0)).toSet == expect)
    // txn state replays through the v2 checkpoint (replay gate holds)
    assert(!DeltaInterop.appendIdempotent(
      spark.range(99, 100).toDF("id"), base, "app-v2", 4L))
    // pure JSON replay must agree exactly
    assert(new File(log, "_last_checkpoint").delete())
    assert(DeltaInterop.read(spark, base).select("id")
      .collect().map(_.getLong(0)).toSet == expect)
  }

  test("column mapping 'name' mode: physical parquet names, logical read") {
    val base = tmp()
    val df = spark.range(10).select(col("id"), (col("id") * 3).as("value"),
      (col("id") % 2).cast("int").cast("string").as("side"))
    DeltaInterop.overwriteColumnMapped(df, base,
      Map("id" -> "col-aaa111", "value" -> "col-bbb222", "side" -> "col-ccc333"),
      partitionBy = Seq("side"))
    // physical layer: data files must carry physical names, no logical ones
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.columnMappingMode == "name")
    // (these partition values are plain digits, so add.path is unencoded)
    val physical = spark.read
      .parquet(s"$base/${snap.files.head.path}")
      .schema.fieldNames.toSet
    assert(physical == Set("col-aaa111", "col-bbb222"),
      s"physical schema was $physical")
    // partitionValues keyed by the physical partition column name
    assert(snap.files.forall(_.partitionValues.keySet == Set("col-ccc333")))
    // logical layer: read resolves to logical names and exact values
    val got = DeltaInterop.read(spark, base)
    assert(got.schema.fieldNames.toSeq == Seq("id", "value", "side"))
    assert(got.count() == 10)
    assert(got.agg(sum("value")).head().getLong(0) == (0 until 10).map(_ * 3).sum)
    assert(got.where(col("side") === "1").count() == 5)
    // partition pruning still keys on the logical name
    val pruned = DeltaInterop.read(spark, base,
      partitionFilters = Map("side" -> "0"))
    assert(pruned.count() == 5)
    assert(pruned.inputFiles.length < got.inputFiles.length)
  }

  test("column-mapped log crafted by hand reads correctly (writer not involved)") {
    val base = tmp()
    val log = new File(base, "_delta_log"); log.mkdirs()
    // parquet file with PHYSICAL column names only
    val scratch = new File(base, ".s")
    spark.range(5).select(col("id").as("col-x9"), (col("id") * 7).as("col-y8"))
      .coalesce(1).write.parquet(scratch.getPath)
    val pf = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
    val part = new File(base, "d0.parquet")
    Files.move(pf.toPath, part.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    // schemaString with LOGICAL names + physicalName metadata, exactly
    // as delta-spark serializes it
    val schemaStr =
      """{"type":"struct","fields":[
        |{"name":"order_id","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-x9"}},
        |{"name":"amount","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-y8"}}
        |]}""".stripMargin.replaceAll("\n", "").replace("\"", "\\\"")
    Files.writeString(new File(log, "00000000000000000000.json").toPath,
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}
         |{"metaData":{"id":"t0","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2"},"createdTime":0}}
         |{"add":{"path":"d0.parquet","partitionValues":{},"size":${part.length()},"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaInterop.read(spark, base)
    assert(got.schema.fieldNames.toSeq == Seq("order_id", "amount"))
    assert(got.agg(sum("amount")).head().getLong(0) == (0 until 5).map(_ * 7).sum)
  }

  test("column mapping 'id' mode: columns resolve by parquet field id, not name") {
    val base = tmp()
    val df = spark.range(10).select(col("id"), (col("id") * 3).as("value"),
      (col("id") % 2).cast("int").cast("string").as("side"))
    // Adversarial physical naming: the physical name of `id` is "value"
    // — a reader that secretly falls back to NAME matching would read
    // id's data into the `value` column (a silent column swap). Only
    // true field-id resolution produces the right values.
    DeltaInterop.overwriteColumnMapped(df, base,
      Map("id" -> "value", "value" -> "col-v2", "side" -> "col-s3"),
      partitionBy = Seq("side"), mode = "id")
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.columnMappingMode == "id")
    assert(snap.fieldId("value").contains(2L))
    val got = DeltaInterop.read(spark, base)
    assert(got.schema.fieldNames.toSeq == Seq("id", "value", "side"))
    assert(got.agg(sum("id")).head().getLong(0) == (0 until 10).sum)
    assert(got.agg(sum("value")).head().getLong(0) == (0 until 10).map(_ * 3).sum,
      "`value` read the wrong physical column — resolution fell back to names")
    // partition pruning still keys on the logical name
    val pruned = DeltaInterop.read(spark, base,
      partitionFilters = Map("side" -> "0"))
    assert(pruned.count() == 5)
  }

  test("id-mode log crafted by hand reads correctly (writer not involved)") {
    val base = tmp()
    val log = new File(base, "_delta_log"); log.mkdirs()
    // data file with physical names AND parquet field ids, as a real
    // id-mode delta-spark writer produces
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val scratch = new File(base, ".s")
    spark.range(5).select(
        col("id").as("col-x9", new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 1L).build()),
        (col("id") * 7).as("col-y8", new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2L).build()))
      .coalesce(1).write.parquet(scratch.getPath)
    val pf = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
    val part = new File(base, "d0.parquet")
    Files.move(pf.toPath, part.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    val schemaStr =
      """{"type":"struct","fields":[
        |{"name":"order_id","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-x9"}},
        |{"name":"amount","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-y8"}}
        |]}""".stripMargin.replaceAll("\n", "").replace("\"", "\\\"")
    Files.writeString(new File(log, "00000000000000000000.json").toPath,
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"t0","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"},"createdTime":0}}
         |{"add":{"path":"d0.parquet","partitionValues":{},"size":${part.length()},"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaInterop.read(spark, base)
    assert(got.schema.fieldNames.toSeq == Seq("order_id", "amount"))
    assert(got.agg(sum("amount")).head().getLong(0) == (0 until 5).map(_ * 7).sum)
  }

  test("reader refuses an unknown columnMapping mode loudly") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(3).toDF("id"), base)
    val schemaJson = spark.range(1).toDF("id").schema.json.replace("\"", "\\\"")
    Files.writeString(new File(s"$base/_delta_log/00000000000000000001.json").toPath,
      s"""{"metaData":{"id":"t1","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"bogus"},"createdTime":0}}""" + "\n")
    val e = intercept[IllegalArgumentException](DeltaInterop.read(spark, base))
    assert(e.getMessage.contains("columnMapping"))
  }

  test("add.stats data skipping: range read opens only overlapping files") {
    val base = tmp()
    // 8 appends, each a tight disjoint id range → 8 files with tight
    // [min,max] stats in the log
    DeltaInterop.overwrite(spark.range(0, 100).toDF("id")
      .withColumn("tag", col("id").cast("string")).coalesce(1), base)
    (1 until 8).foreach(i =>
      DeltaInterop.append(spark.range(i * 100L, i * 100L + 100).toDF("id")
        .withColumn("tag", col("id").cast("string")).coalesce(1), base))
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.files.size == 8)
    assert(snap.files.forall(_.stats.isDefined), "writer recorded no stats")
    val full = DeltaInterop.read(spark, base)
    val ranged = DeltaInterop.readRange(spark, base, "id", Some(250L), Some(310L))
    assert(ranged.inputFiles.length == 2,
      s"expected 2 files admitted, scanned ${ranged.inputFiles.length}")
    assert(ranged.count() == 61)
    assert(ranged.agg(sum("id")).head().getLong(0) ==
      full.where(col("id").between(250, 310)).agg(sum("id")).head().getLong(0))
    // open-ended range
    assert(DeltaInterop.readRange(spark, base, "id", Some(700L), None)
      .inputFiles.length == 1)
    // string column skipping
    assert(DeltaInterop.readRange(spark, base, "tag", Some("500"), Some("500"))
      .count() == 1)
  }

  test("data skipping is conservative: files without stats are kept") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(0, 10).toDF("id").coalesce(1), base)
    // hand-append a file whose add action has NO stats
    val scratch = new File(base, ".s2")
    spark.range(100, 110).toDF("id").coalesce(1).write.parquet(scratch.getPath)
    val pf = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(pf.toPath, new File(base, "noStats.parquet").toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    Files.writeString(new File(s"$base/_delta_log/00000000000000000001.json").toPath,
      s"""{"add":{"path":"noStats.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""" + "\n")
    // range targets only the stats-less file's data: it must be kept
    val got = DeltaInterop.readRange(spark, base, "id", Some(105L), Some(200L))
    assert(got.count() == 5)
    // and the stats-bearing file that misses the range is still pruned
    assert(got.inputFiles.length == 1)
  }

  test("stats survive checkpointing (skipping works from a compacted log)") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(0, 50).toDF("id").coalesce(1), base)
    DeltaInterop.append(spark.range(50, 100).toDF("id").coalesce(1), base)
    DeltaInterop.checkpoint(spark, base)
    // drop the JSON commits so the state must come from the checkpoint
    val log = new File(base, "_delta_log")
    log.listFiles().filter(_.getName.endsWith(".json")).foreach(f => assert(f.delete()))
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.files.forall(_.stats.isDefined), "checkpoint dropped stats")
    val got = DeltaInterop.readRange(spark, base, "id", Some(10L), Some(20L))
    assert(got.inputFiles.length == 1 && got.count() == 11)
  }

  test("timestamp time travel resolves to the newest commit at or before ts") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(5).toDF("id"), base)
    val log = new File(base, "_delta_log")
    val c0 = new File(log, "00000000000000000000.json")
    DeltaInterop.append(spark.range(5, 9).toDF("id"), base)
    val c1 = new File(log, "00000000000000000001.json")
    // pin distinct mtimes (fast test machines can land both in one ms)
    assert(c0.setLastModified(1000000L) && c1.setLastModified(2000000L))
    assert(DeltaInterop.read(spark, base, timestampAsOf = Some(1500000L)).count() == 5)
    assert(DeltaInterop.read(spark, base, timestampAsOf = Some(2000000L)).count() == 9)
    val e = intercept[IllegalArgumentException](
      DeltaInterop.read(spark, base, timestampAsOf = Some(999L)))
    assert(e.getMessage.contains("no Delta commit"))
  }

  test("partition filters prune the file list from the log, not post-scan") {
    val base = tmp()
    val df = spark.range(40).select(col("id"),
      (col("id") % 4).cast("int").cast("string").as("bucket"))
    DeltaInterop.overwrite(df.coalesce(1), base, partitionBy = Seq("bucket"))
    val all = DeltaInterop.read(spark, base)
    val one = DeltaInterop.read(spark, base,
      partitionFilters = Map("bucket" -> "2"))
    assert(one.count() == 10)
    assert(one.inputFiles.length < all.inputFiles.length,
      s"pruned read still scans ${one.inputFiles.length} of ${all.inputFiles.length} files")
    assert(one.inputFiles.length == 1) // coalesce(1) → one file per partition
    val e = intercept[IllegalArgumentException](
      DeltaInterop.read(spark, base, partitionFilters = Map("nope" -> "1")))
    assert(e.getMessage.contains("not a partition column"))
  }

  test("predicates on a Delta read reach the parquet scan (pushdown intact)") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(100).toDF("id"), base)
    val plan = DeltaInterop.read(spark, base)
      .filter(col("id") > 50).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(id,50)"),
      s"filter did not reach the scan:\n$plan")
  }

  test("identical basenames across partition dirs do not collide (real-writer layout)") {
    // Real Spark/Delta partitioned writes reuse one basename
    // (part-00000-<jobUUID>.c000.snappy.parquet) across partition
    // directories within a job. Hand-craft that exact layout: the
    // partition re-attachment join must key on the full path, or rows
    // duplicate and partition values smear across partitions.
    val base = tmp()
    val log = new File(base, "_delta_log"); log.mkdirs()
    def stage(dir: String, ids: Seq[Int]): Long = {
      val scratch = new File(base, ".s")
      spark.createDataFrame(ids.map(i => Tuple1(i.toLong)))
        .toDF("id").coalesce(1).write.mode("overwrite").parquet(scratch.getPath)
      val pf = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new File(base, s"$dir/part-00000-abc.c000.snappy.parquet")
      dst.getParentFile.mkdirs()
      Files.move(pf.toPath, dst.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      dst.length()
    }
    val len1 = stage("b=1", Seq(1, 2, 3))
    val len2 = stage("b=2", Seq(10, 20))
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType)))
      .json.replace("\"", "\\\"")
    Files.writeString(new File(log, "00000000000000000000.json").toPath,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"t0","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["b"],"configuration":{},"createdTime":0}}
         |{"add":{"path":"b=1/part-00000-abc.c000.snappy.parquet","partitionValues":{"b":"1"},"size":$len1,"modificationTime":0,"dataChange":true}}
         |{"add":{"path":"b=2/part-00000-abc.c000.snappy.parquet","partitionValues":{"b":"2"},"size":$len2,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 5, "basename collision duplicated rows")
    assert(got.where(col("b") === "1").agg(sum("id")).head().getLong(0) == 6)
    assert(got.where(col("b") === "2").agg(sum("id")).head().getLong(0) == 30)
  }

  test("partition values with '+', space, '%', '=' round-trip exactly") {
    // '+' is the URLDecoder trap (x-www-form-urlencoded reads it as a
    // space); '%' and '=' exercise Hive-style dir escaping; space is
    // legal-but-literal in partition dirs and %XX-encoded in add.path.
    val base = tmp()
    val vals = Seq("a+b", "a b", "10%", "k=v", "plain")
    val df = spark.createDataFrame(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }).toDF("id", "k")
    DeltaInterop.overwrite(df, base, partitionBy = Seq("k"))
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == vals.size)
    vals.foreach { v =>
      assert(got.where(col("k") === v).count() == 1, s"value [$v] lost in round trip")
    }
    // and the log's partitionValues carry the raw values, not encodings
    val pvs = DeltaInterop.snapshot(spark, base).files
      .flatMap(_.partitionValues.values).toSet
    assert(pvs == vals.toSet, s"log stores $pvs")
  }

  test("percent-encoded add.path resolves to the on-disk file") {
    // hand-crafted log whose add.path is RFC-encoded (space → %20), as
    // the protocol prescribes; the file on disk has the literal space
    val base = tmp()
    val log = new File(base, "_delta_log"); log.mkdirs()
    val scratch = new File(base, ".s")
    spark.range(4).coalesce(1).write.parquet(scratch.getPath)
    val pf = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
    val dst = new File(base, "data file 0.parquet")
    Files.move(pf.toPath, dst.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    val schemaJson = spark.range(1).schema.json.replace("\"", "\\\"")
    Files.writeString(new File(log, "00000000000000000000.json").toPath,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"t0","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":0}}
         |{"add":{"path":"data%20file%200.parquet","partitionValues":{},"size":${dst.length()},"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    assert(DeltaInterop.read(spark, base).count() == 4)
  }

  test("roaring codec: array/bitmap containers, multi-bucket 64-bit positions") {
    import graft.sources.DeletionVectors
    // array containers, two 16-bit buckets + one high-32 bucket
    val small = Seq(0L, 5L, 65536L, 65540L, (1L << 32) + 7L, (1L << 32) + 9L)
    assert(DeletionVectors.decodeDvData(DeletionVectors.dvDataBytes(small)).toSeq
      == small.sorted)
    // > 4096 values in one 16-bit bucket → bitmap container on the wire
    val dense = (0L until 5000L).map(_ * 2)
    assert(DeletionVectors.decodeDvData(DeletionVectors.dvDataBytes(dense)).toSeq
      == dense.sorted)
    // z85 round trip of arbitrary bytes
    val bytes = Array.tabulate(32)(i => (i * 37 % 256).toByte)
    assert(DeletionVectors.z85DecodeBytes(DeletionVectors.z85Encode(bytes)).toSeq
      == bytes.toSeq)
  }

  test("roaring codec: decodes run containers (other writers emit them)") {
    import java.nio.{ByteBuffer, ByteOrder}
    import graft.sources.DeletionVectors
    // hand-built: one bitmap, one run container [10..15] ∪ [100..101]
    val bb = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(DeletionVectors.Magic)
    bb.putLong(1L)            // one 32-bit bitmap
    bb.putInt(0)              // key (high 32 bits)
    // cookie 12347 with (containers-1)=0 in high 16 bits
    bb.putInt(12347)
    bb.put(1.toByte)          // run flags: container 0 is a run container
    bb.putShort(0)            // container key
    bb.putShort(7)            // cardinality - 1 = 8 values
    // < NO_OFFSET_THRESHOLD containers with runs → no offset header
    bb.putShort(2)            // two runs
    bb.putShort(10); bb.putShort(5)   // [10..15]
    bb.putShort(100); bb.putShort(1)  // [100..101]
    val data = java.util.Arrays.copyOf(bb.array(), bb.position())
    assert(DeletionVectors.decodeDvData(data).toSeq ==
      Seq(10L, 11L, 12L, 13L, 14L, 15L, 100L, 101L))
  }

  test("deletion vectors: inline and file-backed DVs subtract rows on read") {
    val base = tmp()
    val df = spark.range(100).select(col("id"), (col("id") % 10).as("m"))
    DeltaInterop.overwrite(df.coalesce(1), base)
    val file = DeltaInterop.snapshot(spark, base).files.head.path
    // rows are written in range order (single partition): position == id
    DeltaInterop.deleteRowPositions(spark, base, file,
      (0L until 100L).filter(_ % 3 == 0), inline = true)
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 66)
    assert(got.where(col("id") % 3 === 0).count() == 0)
    assert(got.agg(sum("id")).head().getLong(0) ==
      (0 until 100).filterNot(_ % 3 == 0).sum)
    // time travel to v0 still sees all rows
    assert(DeltaInterop.read(spark, base, versionAsOf = Some(0L)).count() == 100)

    // file-backed (u storage) on a second table
    val base2 = tmp()
    DeltaInterop.overwrite(df.coalesce(1), base2)
    val file2 = DeltaInterop.snapshot(spark, base2).files.head.path
    DeltaInterop.deleteRowPositions(spark, base2, file2, Seq(1L, 3L, 98L))
    assert(new File(base2).listFiles().exists(_.getName.startsWith("deletion_vector_")),
      "u-storage DV should live in a .bin beside the data")
    val got2 = DeltaInterop.read(spark, base2)
    assert(got2.count() == 97)
    assert(got2.where(col("id").isin(1, 3, 98)).count() == 0)
  }

  test("deletion vectors survive checkpointing") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(50).toDF("id").coalesce(1), base)
    val file = DeltaInterop.snapshot(spark, base).files.head.path
    DeltaInterop.deleteRowPositions(spark, base, file, Seq(0L, 10L, 20L, 30L, 40L))
    DeltaInterop.checkpoint(spark, base)
    // force the checkpoint path: drop the JSON commits at/below it
    val log = new File(base, "_delta_log")
    log.listFiles().filter(f => f.getName.endsWith(".json") &&
      !f.getName.startsWith("_")).foreach(f => assert(f.delete()))
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 45, "checkpoint dropped the deletion vector")
    assert(got.where(col("id") % 10 === 0).count() == 0)
  }

  test("deletion vector on a partitioned file composes with partition attach") {
    val base = tmp()
    val df = spark.range(40).select(col("id"),
      (col("id") % 2).cast("int").cast("string").as("side"))
    DeltaInterop.overwrite(df.coalesce(1), base, partitionBy = Seq("side"))
    val snap = DeltaInterop.snapshot(spark, base)
    val even = snap.files.find(_.partitionValues("side") == "0").get.path
    // delete the first 5 positions of the even file
    DeltaInterop.deleteRowPositions(spark, base, even, (0L until 5L), inline = true)
    val got = DeltaInterop.read(spark, base)
    assert(got.where(col("side") === "1").count() == 20, "odd partition untouched")
    assert(got.where(col("side") === "0").count() == 15)
  }

  test("null partition value round-trips") {
    val base = tmp()
    val df = spark.range(6).select(col("id"),
      when(col("id") < 3, lit("a")).otherwise(lit(null: String)).as("k"))
    DeltaInterop.overwrite(df, base, partitionBy = Seq("k"))
    val got = DeltaInterop.read(spark, base)
    assert(got.where(col("k").isNull).count() == 3)
    assert(got.where(col("k") === "a").count() == 3)
  }
}
