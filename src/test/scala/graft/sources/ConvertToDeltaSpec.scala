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
    // the convert is a real Iceberg table: appends work, source intact
    IcebergInterop.append(spark.range(1000, 1010).toDF("id").coalesce(1), dst)
    assert(IcebergInterop.read(spark, dst).count() == 1010)
    assert(DeltaInterop.read(spark, dl).count() == 1000)
  }

  test("convertFromDelta refuses DVs, column mapping and partitions") {
    val dl = tmp() + "/d"
    DeltaInterop.overwrite(
      spark.range(20).toDF("id").repartitionByRange(2, col("id")), dl)
    graft.sources.DeltaDml.deleteVectoredWhere(spark, dl, col("id") < 5)
    val e1 = intercept[IllegalArgumentException] {
      IcebergInterop.convertFromDelta(spark, dl, tmp() + "/i")
    }
    assert(e1.getMessage.contains("REORG"))
    // purging the vectors repairs the state; the convert then succeeds
    DeltaInterop.reorgPurge(spark, dl)
    val dst = tmp() + "/i2"
    IcebergInterop.convertFromDelta(spark, dl, dst)
    assert(IcebergInterop.read(spark, dst).count() == 15)

    val part = tmp() + "/p"
    DeltaInterop.overwrite(
      spark.range(30).select(col("id"), (col("id") % 3).cast("int").as("b")),
      part, partitionBy = Seq("b"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergInterop.convertFromDelta(spark, part, tmp() + "/i")
    }
    assert(e2.getMessage.contains("partition"))
  }

  test("merge-on-read deletes and transformed specs refuse") {
    val ice = tmp()
    IcebergInterop.overwrite(
      spark.range(20).toDF("id").repartitionByRange(2, col("id")), ice)
    IcebergInterop.deletePositionsWhere(spark, ice, col("id") < 5)
    val e1 = intercept[IllegalArgumentException] {
      DeltaInterop.convertFromIceberg(spark, ice, tmp() + "/t")
    }
    assert(e1.getMessage.contains("rewriteDataFiles"))
    // compaction folds the deletes; the convert then succeeds exactly
    IcebergInterop.rewriteDataFiles(spark, ice)
    val dst = tmp() + "/t2"
    DeltaInterop.convertFromIceberg(spark, ice, dst)
    assert(DeltaInterop.read(spark, dst).count() == 15)

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
