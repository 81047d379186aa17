package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CONVERT TO DELTA from an Iceberg source: zero-copy metadata
  * conversion — the new Delta log references the Iceberg table's live
  * parquet by absolute path, manifest bounds become add.stats (data
  * skipping works without opening a footer), identity partitions carry
  * over, and the hazard states refuse loudly. */
class ConvertToDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("conv_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("unpartitioned convert: value-exact, zero copy, stats prune") {
    val ice = tmp(); val dst = tmp() + "/t"
    IcebergInterop.overwrite(
      spark.range(1000).toDF("id")
        .repartitionByRange(4, col("id"))
        .sortWithinPartitions("id"), ice)
    val srcFiles = IcebergInterop.snapshot(spark, ice).files.map(_.path).toSet
    DeltaInterop.convertFromIceberg(spark, ice, dst)
    val got = DeltaInterop.read(spark, dst)
    assert(got.count() == 1000)
    assert(got.agg(sum("id")).head().getLong(0) == (0L until 1000L).sum)
    // zero copy: every Delta-referenced file IS an Iceberg data file
    val snap = DeltaInterop.snapshot(spark, dst)
    snap.files.foreach { f =>
      assert(srcFiles.contains(
        PathCodec.absNorm(DeltaInterop.resolveDataFile(dst, f.path))),
        s"converted add ${f.path} is not a source file")
    }
    // manifest bounds became add.stats: a narrow range opens ≤2 of 4
    val narrow = DeltaInterop.readRange(spark, dst, "id",
      Some(10L), Some(20L))
    assert(narrow.count() == 11)
    assert(narrow.inputFiles.length <= 2,
      s"stats did not prune: ${narrow.inputFiles.length} files read")
  }

  test("identity partitions carry over; converted table writes independently") {
    val ice = tmp(); val dst = tmp() + "/t"
    IcebergInterop.overwrite(
      spark.range(60).select(col("id"),
        (col("id") % 3).cast("int").as("b")), ice, partitionBy = Seq("b"))
    DeltaInterop.convertFromIceberg(spark, ice, dst)
    val snap = DeltaInterop.snapshot(spark, dst)
    assert(snap.partitionColumns == Seq("b"))
    assert(snap.files.forall(_.partitionValues.keySet == Set("b")))
    val got = DeltaInterop.read(spark, dst)
    assert(got.count() == 60)
    assert(got.filter(col("b") === 1).count() == 20)
    // the convert is a real Delta table: DML works, source untouched
    graft.sources.DeltaDml.deleteVectoredWhere(spark, dst, col("id") < 30)
    assert(DeltaInterop.read(spark, dst).count() == 30)
    assert(IcebergInterop.read(spark, ice).count() == 60,
      "source Iceberg table must be unaffected by the convert's DML")
  }

  test("convertFromDelta: value-exact, zero copy, stats carry into manifests") {
    val dl = tmp() + "/d"; val dst = tmp() + "/i"
    DeltaInterop.overwrite(
      spark.range(1000).toDF("id")
        .repartitionByRange(4, col("id"))
        .sortWithinPartitions("id"), dl)
    val srcFiles = DeltaInterop.snapshot(spark, dl).files
      .map(f => PathCodec.absNorm(DeltaInterop.resolveDataFile(dl, f.path)))
      .toSet
    IcebergInterop.convertFromDelta(spark, dl, dst)
    val got = IcebergInterop.read(spark, dst)
    assert(got.count() == 1000)
    assert(got.agg(sum("id")).head().getLong(0) == (0L until 1000L).sum)
    // zero copy: every manifest entry IS a Delta data file
    val ice = IcebergInterop.snapshot(spark, dst)
    ice.files.foreach(f => assert(srcFiles.contains(PathCodec.absNorm(f.path)),
      s"manifest entry ${f.path} is not a source file"))
    // add.stats became manifest bounds: a narrow range opens ≤2 of 4
    val narrow = IcebergInterop.readRange(spark, dst, "id",
      Some(10L), Some(20L))
    assert(narrow.count() == 11)
    assert(narrow.inputFiles.length <= 2,
      s"bounds did not prune: ${narrow.inputFiles.length} files read")
    // the convert is a real Iceberg table: appends work, source intact.
    // The post-append assert must RESOLVE COLUMNS, not just count():
    // count() reads row-group metadata only, which once hid an append
    // dropping schema.name-mapping.default (making id-less converted
    // files unreadable by any column-resolving scan).
    IcebergInterop.append(spark.range(1000, 1010).toDF("id").coalesce(1), dst)
    assert(IcebergInterop.read(spark, dst).agg(sum("id")).head().getLong(0) ==
      (0L until 1010L).sum)
    assert(DeltaInterop.read(spark, dl).count() == 1000)
  }

  test("convertFromDelta carries deletion vectors as position deletes") {
    // DV ordinals and Iceberg position deletes share the parquet
    // row-index coordinate system — the soft-deleted state TRANSLATES,
    // no purge, no data file rewritten
    val dl = tmp() + "/d"
    DeltaInterop.overwrite(
      spark.range(20).toDF("id").repartitionByRange(2, col("id")), dl)
    graft.sources.DeltaDml.deleteVectoredWhere(spark, dl, col("id") < 5)
    val srcFiles = DeltaInterop.snapshot(spark, dl).files
      .map(f => PathCodec.absNorm(DeltaInterop.resolveDataFile(dl, f.path)))
      .toSet
    val dst = tmp() + "/i"
    IcebergInterop.convertFromDelta(spark, dl, dst)
    val got = IcebergInterop.read(spark, dst)
    assert(got.select("id").as[Long].collect().toSet ==
      (5L until 20L).toSet, "carried deletes did not apply on read")
    val isnap = IcebergInterop.snapshot(spark, dst)
    assert(isnap.deletes.nonEmpty, "no position-delete file written")
    isnap.files.foreach(f => assert(srcFiles.contains(
      PathCodec.absNorm(f.path)),
      s"data file ${f.path} is not a source file — the convert rewrote"))
    // the converted table's own maintenance can fold the carried
    // deletes later, exactly as with natively-written ones
    IcebergInterop.rewriteDataFiles(spark, dst)
    assert(IcebergInterop.snapshot(spark, dst).deletes.isEmpty)
    assert(IcebergInterop.read(spark, dst).count() == 15)
    // the SOURCE's DV state is untouched
    assert(DeltaInterop.read(spark, dl).count() == 15)
    assert(DeltaInterop.snapshot(spark, dl).files
      .flatMap(_.dv).map(_.cardinality).sum == 5L)
  }

  test("partitioned convertFromDelta: zero copy, column projection, pruning") {
    // the common migration shape (the reference's own silver table is
    // partitioned): Delta keeps partition columns OUT of the data
    // files — the convert records identity partition tuples in the
    // manifest and the read path projects the column per file (spec
    // §Column Projection), so the files are NOT rewritten
    val part = tmp() + "/p"; val dst = tmp() + "/i"
    DeltaInterop.overwrite(
      spark.range(30).select(col("id"), (col("id") % 3).cast("int").as("b")),
      part, partitionBy = Seq("b"))
    val srcFiles = DeltaInterop.snapshot(spark, part).files
      .map(f => PathCodec.absNorm(DeltaInterop.resolveDataFile(part, f.path)))
      .toSet
    IcebergInterop.convertFromDelta(spark, part, dst)
    // zero copy: every manifest entry IS a Delta data file, none rewritten
    val ice = IcebergInterop.snapshot(spark, dst)
    assert(ice.partitionColumns == Seq("b"))
    ice.files.foreach(f => assert(srcFiles.contains(PathCodec.absNorm(f.path)),
      s"manifest entry ${f.path} is not a source file — the convert copied"))
    // value-exact INCLUDING the projected partition column
    val got = IcebergInterop.read(spark, dst)
      .select("id", "b").as[(Long, Int)].collect().toSet
    assert(got == (0L until 30L).map(i => (i, (i % 3).toInt)).toSet)
    // partition pruning works cross-format: one partition's files only
    val one = IcebergInterop.read(spark, dst,
      partitionFilters = Map("b" -> "2"))
    assert(one.select("id").as[Long].collect().toSet ==
      (0L until 30L).filter(_ % 3 == 2).toSet)
    assert(one.inputFiles.length < IcebergInterop.read(spark, dst)
      .inputFiles.length, "partition filter did not prune files")
    // typed pruning through readEq too
    assert(IcebergInterop.readEq(spark, dst, Map("b" -> 2)).count() == 10)
    // the convert is a real partitioned Iceberg table: appends inherit
    // the spec; mixed reads (converted + native files) stay exact
    IcebergInterop.append(
      spark.range(30, 33).select(col("id"), lit(1).as("b")).coalesce(1), dst)
    assert(IcebergInterop.readEq(spark, dst, Map("b" -> 1))
      .select("id").as[Long].collect().toSet ==
      ((0L until 30L).filter(_ % 3 == 1) ++ (30L until 33L)).toSet)
    // source stays intact and independently writable
    assert(DeltaInterop.read(spark, part).count() == 30)
    DeltaInterop.append(spark.range(100, 102)
      .select(col("id"), lit(0).as("b")).coalesce(1), part,
      partitionBy = Seq("b"))
    assert(DeltaInterop.read(spark, part).count() == 32)
    assert(IcebergInterop.read(spark, dst).count() == 33,
      "source DML leaked into the converted table")
  }

  test("date-partitioned convertFromDelta (the reference's silver shape)") {
    val part = tmp() + "/p"; val dst = tmp() + "/i"
    DeltaInterop.overwrite(
      spark.range(20).select(col("id"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (col("id") % 2).cast("int")).as("ingestion_date")),
      part, partitionBy = Seq("ingestion_date"))
    IcebergInterop.convertFromDelta(spark, part, dst)
    val got = IcebergInterop.read(spark, dst)
    assert(got.count() == 20)
    // the projected date column reads back value-exact
    val dates = got.select("ingestion_date").distinct()
      .as[java.sql.Date].collect().map(_.toString).toSet
    assert(dates == Set("2024-01-01", "2024-01-02"))
    // typed identity pruning on a date value
    val one = IcebergInterop.readEq(spark, dst,
      Map("ingestion_date" -> java.sql.Date.valueOf("2024-01-02")))
    assert(one.select("id").as[Long].collect().toSet ==
      (0L until 20L).filter(_ % 2 == 1).toSet)
    assert(one.inputFiles.length < got.inputFiles.length,
      "date identity filter did not prune files")
  }

  test("convertFromIceberg carries position deletes as deletion vectors") {
    val ice = tmp()
    IcebergInterop.overwrite(
      spark.range(20).toDF("id").repartitionByRange(2, col("id")), ice)
    IcebergInterop.deletePositionsWhere(spark, ice, col("id") < 5)
    val srcFiles = IcebergInterop.snapshot(spark, ice).files
      .map(f => PathCodec.absNorm(f.path)).toSet
    val dst = tmp() + "/t"
    DeltaInterop.convertFromIceberg(spark, ice, dst)
    val got = DeltaInterop.read(spark, dst)
    assert(got.select("id").as[Long].collect().toSet ==
      (5L until 20L).toSet, "carried deletes did not apply on read")
    val dsnap = DeltaInterop.snapshot(spark, dst)
    assert(dsnap.files.flatMap(_.dv).map(_.cardinality).sum == 5L,
      "position deletes did not translate into deletion vectors")
    assert(dsnap.writerFeatureSet.contains("deletionVectors"))
    dsnap.files.foreach(f => assert(srcFiles.contains(
      PathCodec.absNorm(DeltaInterop.resolveDataFile(dst, f.path))),
      s"add ${f.path} is not a source file — the convert rewrote"))
    // the converted table's own REORG can purge the carried vectors
    DeltaInterop.reorgPurge(spark, dst)
    assert(DeltaInterop.snapshot(spark, dst).files
      .forall(_.dv.forall(_.cardinality == 0L)))
    assert(DeltaInterop.read(spark, dst).count() == 15)
    // the SOURCE's merge-on-read state is untouched
    assert(IcebergInterop.snapshot(spark, ice).deletes.nonEmpty)
    assert(IcebergInterop.read(spark, ice).count() == 15)
  }

  test("positionalizeEqualityDeletes unlocks the CDC-upserted convert") {
    // a CDC-upserted table carries equality deletes (value-match, no
    // Delta encoding); positionalizing them — one scan, no data-file
    // rewrite — turns them into position deletes, which then translate
    // into deletion vectors on convert
    val ice = tmp()
    IcebergInterop.overwrite(
      spark.range(12).select(col("id"), (col("id") * 10).as("v"))
        .repartitionByRange(2, col("id")), ice)
    IcebergInterop.mergeUpsert(spark, ice,
      spark.createDataFrame(Seq((3L, -3L), (7L, -7L), (50L, -50L)))
        .toDF("id", "v"), Seq("id"))
    assert(IcebergInterop.snapshot(spark, ice).eqDeletes.nonEmpty)
    val before = IcebergInterop.read(spark, ice)
      .as[(Long, Long)].collect().toSet
    IcebergInterop.positionalizeEqualityDeletes(spark, ice)
    val snap = IcebergInterop.snapshot(spark, ice)
    assert(snap.eqDeletes.isEmpty, "equality deletes survived")
    assert(snap.deletes.nonEmpty, "no position deletes written")
    assert(IcebergInterop.read(spark, ice)
      .as[(Long, Long)].collect().toSet == before,
      "positionalization changed table contents")
    // the convert now succeeds, deletes riding as DVs
    val dst = tmp() + "/d"
    DeltaInterop.convertFromIceberg(spark, ice, dst)
    assert(DeltaInterop.read(spark, dst)
      .as[(Long, Long)].collect().toSet == before)
    assert(DeltaInterop.snapshot(spark, dst).files
      .flatMap(_.dv).map(_.cardinality).sum == 2L) // rows 3 and 7 died
    // an equality delete matching NOTHING drops as dead weight
    val ice2 = tmp()
    IcebergInterop.overwrite(spark.range(5).toDF("id").coalesce(1), ice2)
    IcebergInterop.addEqualityDeletes(spark, ice2,
      spark.range(100, 103).toDF("id"), Seq("id"))
    IcebergInterop.positionalizeEqualityDeletes(spark, ice2)
    val s2 = IcebergInterop.snapshot(spark, ice2)
    assert(s2.eqDeletes.isEmpty && s2.deletes.isEmpty)
    assert(IcebergInterop.read(spark, ice2).count() == 5)
  }

  test("equality deletes and transformed specs still refuse") {
    // equality deletes match by VALUE — positionalizing them would need
    // a scan; Delta has no value-match encoding
    val ice = tmp()
    IcebergInterop.overwrite(
      spark.range(10).toDF("id").coalesce(1), ice)
    IcebergInterop.addEqualityDeletes(spark, ice,
      spark.range(3).toDF("id"), Seq("id"))
    val e1 = intercept[IllegalArgumentException] {
      DeltaInterop.convertFromIceberg(spark, ice, tmp() + "/t")
    }
    assert(e1.getMessage.contains("equality"))

    val ice2 = tmp()
    IcebergInterop.overwriteTransformed(
      spark.range(40).select(col("id"),
        (col("id") % 7).cast("int").as("k")),
      ice2, Seq("k" -> IcebergInterop.IceTransform.Bucket(4)))
    val e2 = intercept[IllegalArgumentException] {
      DeltaInterop.convertFromIceberg(spark, ice2, tmp() + "/t")
    }
    assert(e2.getMessage.contains("transform"))
  }
}
