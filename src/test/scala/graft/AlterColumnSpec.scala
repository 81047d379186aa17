package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.{GraftLog, GraftSql}
import graft.sources.{DeltaInterop, IcebergInterop}

/** The ALTER TABLE column lifecycle beyond ADD COLUMNS: RENAME COLUMN
  * and DROP COLUMNS, per format —
  *  - Delta: column-mapping UPGRADE (enableColumnMapping) then
  *    metadata-only rename/drop; appends conform logical→physical;
  *  - Iceberg: field-id rename/drop, appends stamp the TABLE's ids
  *    (not positional — the post-drop id-gap hazard);
  *  - graft-log: honest copy-on-write rewrites.
  * The recurring hazard under test everywhere: a later re-ADD of a
  * dropped name must read NULL, never resurrect old file data. */
class AlterColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("alter_spec_").toFile
    d.deleteOnExit(); d.getPath
  }

  // ------------------------------------------------------------- Delta

  test("delta: enableColumnMapping is metadata-only and keeps reads exact") {
    val base = tmp()
    DeltaInterop.overwrite(
      Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v"), base)
    val filesBefore = DeltaInterop.snapshot(spark, base).files.map(_.path)
    DeltaInterop.enableColumnMapping(spark, base)
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.columnMappingMode == "name")
    assert(snap.physicalName("k") == "k") // upgrade: physical = logical
    assert(snap.files.map(_.path) == filesBefore, "no file touched")
    assert(DeltaInterop.read(spark, base).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5)))
    // idempotent
    val v = DeltaInterop.enableColumnMapping(spark, base)
    assert(v == snap.version)
  }

  test("delta: rename is metadata-only; values survive; old name gone") {
    val base = tmp()
    DeltaInterop.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), base)
    // unmapped rename refuses
    val err = intercept[IllegalArgumentException] {
      DeltaInterop.renameColumn(spark, base, "v", "price")
    }
    assert(err.getMessage.contains("column mapping"))
    DeltaInterop.enableColumnMapping(spark, base)
    DeltaInterop.renameColumn(spark, base, "v", "price")
    val got = DeltaInterop.read(spark, base).orderBy("k")
    assert(got.columns.toSeq == Seq("k", "price"))
    assert(got.select(sum("price")).head().getDouble(0) == 30.0)
    // append with LOGICAL names lands under the physical layout
    DeltaInterop.append(Seq((3L, 30.0)).toDF("k", "price"), base)
    assert(DeltaInterop.read(spark, base).select(sum("price"))
      .head().getDouble(0) == 60.0)
    assert(DeltaInterop.read(spark, base)
      .where(col("price").isNull).count() == 0)
  }

  test("delta: rename of a partition column carries partitionColumns") {
    val base = tmp()
    DeltaInterop.overwrite(
      Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "part", "v"),
      base, partitionBy = Seq("part"))
    DeltaInterop.enableColumnMapping(spark, base)
    DeltaInterop.renameColumn(spark, base, "part", "bucket")
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.partitionColumns == Seq("bucket"))
    val got = DeltaInterop.read(spark, base)
    assert(got.where(col("bucket") === "x").count() == 1)
    // logical-named append re-partitions under the renamed column
    DeltaInterop.append(Seq((3L, "x", 3.0)).toDF("k", "bucket", "v"), base)
    assert(DeltaInterop.read(spark, base)
      .where(col("bucket") === "x").count() == 2)
  }

  test("delta: drop + re-add reads NULL, never resurrects old data") {
    val base = tmp()
    DeltaInterop.overwrite(
      Seq((1L, "secret1", 1.0), (2L, "secret2", 2.0)).toDF("k", "s", "v"),
      base)
    // unmapped drop refuses (the resurrection hazard)
    intercept[IllegalArgumentException] {
      DeltaInterop.dropColumns(spark, base, Seq("s"))
    }
    DeltaInterop.enableColumnMapping(spark, base)
    DeltaInterop.dropColumns(spark, base, Seq("s"))
    assert(DeltaInterop.read(spark, base).columns.toSeq == Seq("k", "v"))
    // re-ADD the same logical name: fresh id + physical name
    DeltaInterop.addColumns(spark, base,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
    val got = DeltaInterop.read(spark, base)
    assert(got.where(col("s").isNotNull).count() == 0,
      "old 'secret' values resurrected through a reused name")
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.physicalName("s") != "s", "re-added field must get a fresh physical name")
    assert(snap.configuration("delta.columnMapping.maxColumnId").toLong == 4L)
    // partition columns refuse to drop
    val pbase = tmp()
    DeltaInterop.overwrite(Seq((1L, "x")).toDF("k", "part"), pbase,
      partitionBy = Seq("part"))
    DeltaInterop.enableColumnMapping(spark, pbase)
    intercept[IllegalArgumentException] {
      DeltaInterop.dropColumns(spark, pbase, Seq("part"))
    }
  }

  test("delta: mapped tables take MERGE and UPDATE (CDF off)") {
    import graft.sources.DeltaDml
    val base = tmp()
    DeltaInterop.overwrite(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"), base)
    DeltaInterop.enableColumnMapping(spark, base)
    DeltaInterop.renameColumn(spark, base, "v", "price")
    // keyed MERGE with LOGICAL names: update one, insert one
    DeltaDml.mergeUpsert(spark, base,
      Seq((2L, 22.0), (9L, 90.0)).toDF("k", "price"), "k")
    val got = DeltaInterop.read(spark, base).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 22.0), (3L, 30.0), (9L, 90.0)))
    // UPDATE through the mapped path
    DeltaDml.updateWhere(spark, base, col("k") === 1L,
      Map("price" -> lit(11.0)))
    assert(DeltaInterop.read(spark, base).where(col("k") === 1)
      .head().getDouble(1) == 11.0)
    assert(DeltaInterop.read(spark, base)
      .where(col("price").isNull).count() == 0,
      "mapped DML staged logical-named files (NULL resurrection)")
  }

  test("delta: mapped tables with CDF on stage physical-named change rows") {
    import graft.sources.DeltaDml
    val base = tmp()
    DeltaInterop.overwrite(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"), base,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaInterop.enableColumnMapping(spark, base)
    DeltaInterop.renameColumn(spark, base, "v", "price")
    val v0 = DeltaInterop.snapshot(spark, base).version
    // all three mutating paths on the renamed table, with CDF staging
    DeltaDml.updateWhere(spark, base, col("k") === 2L,
      Map("price" -> lit(22.0)))
    DeltaDml.mergeUpsert(spark, base,
      Seq((3L, 33.0), (9L, 90.0)).toDF("k", "price"), "k")
    DeltaDml.deleteVectoredWhere(spark, base, col("k") === 1L)
    // table value correct through the mapped DML
    assert(DeltaInterop.read(spark, base).orderBy("k")
      .as[(Long, Double)].collect().toSeq ==
      Seq((2L, 22.0), (3L, 33.0), (9L, 90.0)))
    // the change feed resolves the physical-named cdc files back to
    // LOGICAL columns — a logical-named staging or unmapped read
    // would surface `price` as NULL here
    val feed = DeltaDml.readChangeFeed(spark, base, v0 + 1)
      .select(col("k"), col("price"), col("_change_type"))
    assert(feed.where(col("price").isNull).count() == 0,
      "mapped cdc rows read back NULL (name resolution broken)")
    val byType = feed.groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    // UPDATE k=2 and MERGE-matched k=3 → pre+post pairs; MERGE k=9 →
    // insert; DV delete k=1 → delete
    assert(byType == Map("update_preimage" -> 2L, "update_postimage" -> 2L,
      "insert" -> 1L, "delete" -> 1L), s"got $byType")
    // exact rows: update pre/post images carry the renamed column
    assert(feed.where(col("_change_type") === "update_postimage" &&
        col("k") === 2L)
      .select("k", "price").as[(Long, Double)].head() == ((2L, 22.0)))
    // the staged files themselves must be PHYSICAL-named (protocol
    // shape for external mapped readers)
    val cdcFile = new java.io.File(base, "_change_data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val physCols = spark.read.parquet(cdcFile.getPath).columns.toSet
    assert(!physCols.contains("price") && physCols.contains("_change_type"),
      s"cdc files must carry physical names, got $physCols")
  }

  test("delta: schema evolution preserves the table id") {
    val base = tmp()
    DeltaInterop.overwrite(Seq((1L, 1.0)).toDF("k", "v"), base)
    val id0 = DeltaInterop.snapshot(spark, base).tableId
    assert(id0.isDefined)
    DeltaInterop.addColumns(spark, base,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.DoubleType))))
    assert(DeltaInterop.snapshot(spark, base).tableId == id0)
    DeltaInterop.enableColumnMapping(spark, base)
    assert(DeltaInterop.snapshot(spark, base).tableId == id0)
    DeltaInterop.renameColumn(spark, base, "w", "weight")
    assert(DeltaInterop.snapshot(spark, base).tableId == id0)
    DeltaInterop.restore(spark, base, 0L)
    assert(DeltaInterop.snapshot(spark, base).tableId == id0)
  }

  // ----------------------------------------------------------- Iceberg

  test("iceberg: rename keeps field ids; old data reads under the new name") {
    val base = tmp()
    IcebergInterop.overwrite(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").coalesce(1), base)
    IcebergInterop.renameColumn(base, "v", "price")
    val got = IcebergInterop.read(spark, base).orderBy("k")
    assert(got.columns.toSeq == Seq("k", "price"))
    assert(got.select(sum("price")).head().getDouble(0) == 30.0)
    // append AFTER the rename: new files must stamp the ORIGINAL id
    IcebergInterop.append(Seq((3L, 30.0)).toDF("k", "price").coalesce(1), base)
    val all = IcebergInterop.read(spark, base)
    assert(all.select(sum("price")).head().getDouble(0) == 60.0)
    assert(all.where(col("price").isNull).count() == 0)
    // rename refusals
    intercept[IllegalArgumentException] {
      IcebergInterop.renameColumn(base, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.renameColumn(base, "k", "price")
    }
  }

  test("iceberg: drop retires the id; appends skip the gap; re-add reads NULL") {
    val base = tmp()
    IcebergInterop.overwrite(
      Seq((1L, "secret", 1.0), (2L, "secret", 2.0)).toDF("k", "s", "v")
        .coalesce(1), base)
    IcebergInterop.dropColumn(spark, base, "s")
    assert(IcebergInterop.read(spark, base).columns.toSeq == Seq("k", "v"))
    // append into the gapped schema (k=1, v=3): positional stamping
    // would write v under id 2 = the DROPPED field — assert it reads
    IcebergInterop.append(Seq((3L, 3.0)).toDF("k", "v").coalesce(1), base)
    val got = IcebergInterop.read(spark, base).orderBy("k")
    assert(got.as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    // re-ADD the dropped name: fresh id — old 'secret' data stays dead
    IcebergInterop.addColumn(base, "s",
      org.apache.spark.sql.types.StringType)
    assert(IcebergInterop.read(spark, base)
      .where(col("s").isNotNull).count() == 0,
      "old equality data resurrected through a reused name")
  }

  test("iceberg: drop refuses partition sources and eq-delete keys") {
    val base = tmp()
    IcebergInterop.overwrite(
      Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "part", "v").coalesce(1),
      base, Seq("part"))
    val err = intercept[IllegalArgumentException] {
      IcebergInterop.dropColumn(spark, base, "part")
    }
    assert(err.getMessage.contains("partition spec"))
    // a live equality delete on k blocks dropping k
    val ebase = tmp()
    IcebergInterop.overwrite(
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").coalesce(1), ebase)
    IcebergInterop.mergeUpsert(spark, ebase,
      Seq((2L, 22.0)).toDF("k", "v").coalesce(1), Seq("k"))
    val err2 = intercept[IllegalArgumentException] {
      IcebergInterop.dropColumn(spark, ebase, "k")
    }
    assert(err2.getMessage.contains("equality-delete"))
  }

  test("iceberg: bounds skipping still prunes after a rename") {
    val base = tmp()
    // two files with disjoint k ranges
    IcebergInterop.overwrite(
      (0L until 50L).map(k => (k, k * 1.0)).toDF("k", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"), base)
    IcebergInterop.renameColumn(base, "k", "key")
    val ranged = IcebergInterop.readRange(spark, base, "key",
      Some(45L), Some(49L))
    assert(ranged.count() == 5)
    assert(ranged.inputFiles.length == 1,
      s"rename broke bound resolution: ${ranged.inputFiles.toSeq}")
  }

  test("iceberg: TYPE promotion int->long is metadata-only; old files " +
       "read widened; bounds still prune by stored width") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val base = tmp()
    IcebergInterop.overwrite(
      (0 until 50).map(k => (k, k * 1.0)).toDF("n", "v")
        .select(col("n").cast(IntegerType).as("n"), col("v"))
        .repartitionByRange(2, col("n")).sortWithinPartitions("n"), base)
    val filesBefore = IcebergInterop.snapshot(spark, base).files.map(_.path)
    IcebergInterop.promoteColumnType(base, "n", LongType)
    // metadata-only: same data files, wider schema, exact values
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.files.map(_.path) == filesBefore)
    assert(snap.schema("n").dataType == LongType)
    val got = IcebergInterop.read(spark, base)
    assert(got.schema("n").dataType == LongType)
    assert(got.agg(sum("n")).head().getLong(0) == (0 until 50).sum)
    // appends carry values a 32-bit column could not hold
    IcebergInterop.append(
      Seq((10000000000L, 1.5)).toDF("n", "v").coalesce(1), base)
    assert(IcebergInterop.read(spark, base)
      .agg(max("n")).head().getLong(0) == 10000000000L)
    // pre-promotion bounds are 4-byte ints; post-promotion 8-byte longs
    // — range pruning must decode each by its STORED width
    val ranged = IcebergInterop.readRange(spark, base, "n",
      Some(45L), Some(49L))
    assert(ranged.count() == 5)
    assert(ranged.inputFiles.length == 1,
      s"promotion broke bound pruning: ${ranged.inputFiles.toSeq}")
  }

  test("iceberg: illegal type changes refuse loudly") {
    import org.apache.spark.sql.types._
    val base = tmp()
    IcebergInterop.overwrite(
      Seq((1L, 1.0f, BigDecimal("12.34"))).toDF("l", "f", "d")
        .select(col("l"), col("f").cast(FloatType).as("f"),
          col("d").cast(DecimalType(10, 2)).as("d")).coalesce(1), base)
    // narrowing, cross-family, and scale changes all refuse
    intercept[IllegalArgumentException](
      IcebergInterop.promoteColumnType(base, "l", IntegerType))
    intercept[IllegalArgumentException](
      IcebergInterop.promoteColumnType(base, "l", StringType))
    intercept[IllegalArgumentException](
      IcebergInterop.promoteColumnType(base, "d", DecimalType(12, 4)))
    // the legal decimal widen (same scale, more precision) serves
    IcebergInterop.promoteColumnType(base, "d", DecimalType(14, 2))
    assert(IcebergInterop.read(spark, base).schema("d").dataType ==
      DecimalType(14, 2))
    // float -> double
    IcebergInterop.promoteColumnType(base, "f", DoubleType)
    assert(IcebergInterop.read(spark, base)
      .agg(sum("f")).head().getDouble(0) == 1.0)
  }

  test("SQL ALTER COLUMN TYPE widens on ALL three formats identically") {
    import org.apache.spark.sql.types.IntegerType
    val ice = tmp(); val log = tmp(); val del = tmp()
    val src = (0 until 20).map(k => (k, k * 2.0)).toDF("n", "v")
      .select(col("n").cast(IntegerType).as("n"), col("v"))
    IcebergInterop.overwrite(src.coalesce(1), ice)
    GraftLog.overwrite(src, log)
    DeltaInterop.overwrite(src, del)
    GraftSql.registerIcebergTable(spark, "promo_ice", ice)
    GraftSql.registerTable(spark, "promo_log", log)
    GraftSql.registerDeltaTable(spark, "promo_del", del)
    Seq("promo_ice", "promo_log", "promo_del").foreach { t =>
      GraftSql.sql(spark, s"ALTER TABLE $t ALTER COLUMN n TYPE BIGINT")
      val df = spark.table(t)
      assert(df.schema("n").dataType ==
        org.apache.spark.sql.types.LongType, t)
      assert(df.agg(sum("n")).head().getLong(0) == (0 until 20).sum, t)
    }
  }

  test("delta: typeWidening is metadata-only; feature gates declared; " +
       "DML and checkpoint survive the widened column") {
    import graft.sources.DeltaDml
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val base = tmp()
    DeltaInterop.overwrite(
      (0 until 30).map(k => (k, k * 1.0)).toDF("n", "v")
        .select(col("n").cast(IntegerType).as("n"), col("v")), base)
    val filesBefore = DeltaInterop.snapshot(spark, base).files.map(_.path)
    DeltaInterop.widenColumnType(spark, base, "n", LongType)
    val snap = DeltaInterop.snapshot(spark, base)
    // metadata-only, and the protocol declares the feature BOTH ways
    // (a reader that cannot widen must refuse this table)
    assert(snap.files.map(_.path) == filesBefore)
    assert(snap.minReaderVersion == 3 && snap.minWriterVersion == 7)
    assert(snap.readerFeatureSet.contains("typeWidening"))
    assert(snap.writerFeatureSet.contains("typeWidening"))
    assert(snap.schema("n").dataType == LongType)
    // the change history lands in the field metadata
    val tc = snap.schema("n").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length == 1 && tc.head.getString("fromType") == "integer" &&
      tc.head.getString("toType") == "long")
    // old narrow files read widened, exactly
    val got = DeltaInterop.read(spark, base)
    assert(got.schema("n").dataType == LongType)
    assert(got.agg(sum("n")).head().getLong(0) == (0 until 30).sum)
    // appends carry 64-bit values; DML and checkpoint keep everything
    DeltaInterop.append(
      Seq((8000000000L, 9.0)).toDF("n", "v").coalesce(1), base)
    DeltaDml.deleteVectoredWhere(spark, base, col("n") < 3)
    DeltaInterop.checkpoint(spark, base)
    val after = DeltaInterop.read(spark, base)
    assert(after.count() == 28)
    assert(after.agg(max("n")).head().getLong(0) == 8000000000L)
    // illegal changes refuse
    intercept[IllegalArgumentException](
      DeltaInterop.widenColumnType(spark, base, "n", IntegerType))
  }

  test("iceberg: a FOREIGN partition-spec transform degrades to " +
       "no-pruning reads; writes refuse") {
    val base = tmp()
    IcebergInterop.overwrite(
      (0L until 40L).map(k => (k, k % 4)).toDF("id", "k"),
      base, partitionBy = Seq("k"))
    // simulate a table written by a future engine: rewrite the spec's
    // transform to something this engine does not implement
    val metaDir = new File(base, "metadata")
    val v = Files.readString(
      new File(metaDir, "version-hint.text").toPath).trim
    val p = new File(metaDir, s"v$v.metadata.json").toPath
    val m = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val root = m.readTree(Files.readString(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val specs = root.get("partition-specs")
    (0 until specs.size()).foreach { i =>
      val fs = specs.get(i).get("fields")
      (0 until fs.size()).foreach { j =>
        fs.get(j).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("transform", "supertransform[8,2]")
      }
    }
    Files.writeString(p, m.writeValueAsString(root))
    // plain read: exact (the transform never mattered to the scan)
    assert(IcebergInterop.read(spark, base).count() == 40)
    // point read through the foreign spec: pruning is skipped, the row
    // predicate keeps the result exact — the read must NOT die
    val got = IcebergInterop.readEq(spark, base, Map("k" -> 2L))
    assert(got.count() == 10)
    // writes refuse: the engine cannot PRODUCE partition values for a
    // transform it does not understand
    intercept[IllegalArgumentException] {
      IcebergInterop.append(
        Seq((100L, 0L)).toDF("id", "k").coalesce(1), base)
    }
  }

  test("CONVERT carries a widened/promoted column across formats " +
       "value-exact") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    // Delta widened -> Iceberg: the converted table's schema is the
    // WIDE type; pre-widening int32 files read widened on the other side
    val del = tmp()
    DeltaInterop.overwrite(
      (0 until 25).map(k => (k, k * 2.0)).toDF("n", "v")
        .select(col("n").cast(IntegerType).as("n"), col("v")), del)
    DeltaInterop.widenColumnType(spark, del, "n", LongType)
    DeltaInterop.append(
      Seq((7000000000L, 1.0)).toDF("n", "v").coalesce(1), del)
    val ice = tmp() + "/ice"
    IcebergInterop.convertFromDelta(spark, del, ice)
    val gotIce = IcebergInterop.read(spark, ice)
    assert(gotIce.schema("n").dataType == LongType)
    assert(gotIce.agg(sum("n")).head().getLong(0) ==
      (0 until 25).sum.toLong + 7000000000L)
    // Iceberg promoted -> Delta: same contract in the other direction
    val ice2 = tmp()
    IcebergInterop.overwrite(
      (0 until 25).map(k => (k, k * 2.0)).toDF("n", "v")
        .select(col("n").cast(IntegerType).as("n"), col("v"))
        .coalesce(1), ice2)
    IcebergInterop.promoteColumnType(ice2, "n", LongType)
    val del2 = tmp() + "/delta"
    DeltaInterop.convertFromIceberg(spark, ice2, del2)
    val gotDel = DeltaInterop.read(spark, del2)
    assert(gotDel.schema("n").dataType == LongType)
    assert(gotDel.agg(sum("n")).head().getLong(0) == (0 until 25).sum)
  }

  // ---------------------------------------------------------- graft-log

  test("graft-log: rename/drop are copy-on-write; re-add cannot resurrect") {
    val base = tmp()
    GraftLog.overwriteClustered(
      Seq((1L, "secret", 1.0), (2L, "secret", 2.0)).toDF("k", "s", "v"),
      base, Seq("k"), nFiles = 1)
    val v1 = GraftLog.renameColumnRewrite(spark, base, "v", "price")
    val got = GraftLog.read(spark, base).orderBy("k")
    assert(got.columns.toSeq == Seq("k", "s", "price"))
    assert(got.select(sum("price")).head().getDouble(0) == 3.0)
    // ONE commit; files fully swapped (no old-name file lingers live)
    assert(GraftLog.snapshot(base).version == v1)
    GraftLog.dropColumnsRewrite(spark, base, Seq("s"))
    assert(GraftLog.read(spark, base).columns.toSeq == Seq("k", "price"))
    // re-add: files were REWRITTEN without the column, so NULL is
    // structural, not a mapping trick
    GraftLog.addColumns(base, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType))))
    assert(GraftLog.read(spark, base).where(col("s").isNotNull).count() == 0)
    // refusals
    intercept[IllegalArgumentException] {
      GraftLog.renameColumnRewrite(spark, base, "missing", "x")
    }
    intercept[IllegalArgumentException] {
      GraftLog.dropColumnsRewrite(spark, base, Seq("k", "price", "s"))
    }
  }

  test("graft-log: rename rewrite folds deletion vectors in") {
    val base = tmp()
    GraftLog.overwriteClustered(
      (0L until 20L).map(k => (k, k * 1.0)).toDF("k", "v"), base,
      Seq("k"), nFiles = 2)
    GraftLog.deleteVectored(spark, base, col("k") < 5)
    GraftLog.renameColumnRewrite(spark, base, "v", "price")
    val got = GraftLog.read(spark, base)
    assert(got.count() == 15)
    assert(GraftLog.snapshot(base).dvFiles.isEmpty, "DVs must fold away")
  }

  // ----------------------------------------------------------- SQL layer

  test("SQL ALTER TABLE RENAME/DROP COLUMN and SET TBLPROPERTIES") {
    val dbase = tmp()
    DeltaInterop.overwrite(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"), dbase)
    GraftSql.registerDeltaTable(spark, "alter_d", dbase)
    // rename before mapping refuses THROUGH the SQL surface too
    val err = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "ALTER TABLE alter_d RENAME COLUMN v TO price")
    }
    assert(err.getMessage.contains("column mapping"))
    GraftSql.sql(spark, "ALTER TABLE alter_d SET TBLPROPERTIES " +
      "('delta.columnMapping.mode' = 'name')")
    GraftSql.sql(spark, "ALTER TABLE alter_d RENAME COLUMN v TO price")
    GraftSql.sql(spark, "ALTER TABLE alter_d DROP COLUMN s")
    assert(spark.sql("SELECT sum(price) AS s FROM alter_d")
      .head().getDouble(0) == 3.0)
    assert(spark.table("alter_d").columns.toSeq == Seq("k", "price"))
    // IF EXISTS filters silently; plain drop of a missing column errors
    GraftSql.sql(spark, "ALTER TABLE alter_d DROP COLUMN IF EXISTS ghost")
    intercept[Exception] {
      GraftSql.sql(spark, "ALTER TABLE alter_d DROP COLUMN ghost")
    }
    // iceberg + graft-log legs through SQL
    val ibase = tmp()
    IcebergInterop.overwrite(Seq((1L, 1.0)).toDF("k", "v").coalesce(1), ibase)
    GraftSql.registerIcebergTable(spark, "alter_i", ibase)
    GraftSql.sql(spark, "ALTER TABLE alter_i RENAME COLUMN v TO price")
    assert(spark.table("alter_i").columns.toSeq == Seq("k", "price"))
    val lbase = tmp()
    GraftLog.overwriteClustered(Seq((1L, 1.0, "z")).toDF("k", "v", "s"),
      lbase, Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "alter_l", lbase)
    GraftSql.sql(spark, "ALTER TABLE alter_l RENAME COLUMN v TO price")
    GraftSql.sql(spark, "ALTER TABLE alter_l DROP COLUMNS (s)")
    assert(spark.table("alter_l").columns.toSeq == Seq("k", "price"))
    // SET TBLPROPERTIES on a non-Delta table refuses
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "ALTER TABLE alter_l SET TBLPROPERTIES ('x' = 'y')")
    }
  }
}
