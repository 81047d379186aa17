package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.pipeline.{GraftLog, GraftSql}
import graft.sources.{DeltaInterop, IcebergInterop}

/** Maintenance SQL: OPTIMIZE / VACUUM / RESTORE / DESCRIBE HISTORY —
  * the warehouse idioms Spark's parser rejects, shape-matched by
  * GraftSql and dispatched to each format's own maintenance
  * primitives. Every statement must preserve the table's value
  * (OPTIMIZE/VACUUM) or restore an exact earlier value (RESTORE). */
class MaintenanceSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_maint_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  test("OPTIMIZE folds graft-log small files; value identical") {
    val base = freshBase("log_opt")
    GraftLog.overwrite((0L until 40L).map(k => (k, k * 2)).toDF("k", "v")
      .repartition(8), base)
    GraftSql.registerTable(spark, "maint_log_opt", base)
    val before = GraftLog.snapshot(base).files.size
    assert(before >= 8)
    val res = GraftSql.sql(spark, "OPTIMIZE maint_log_opt")
    assert(res.select("operation").head().getString(0) == "OPTIMIZE")
    assert(GraftLog.snapshot(base).files.size < before)
    assert(spark.sql("SELECT sum(v) AS s FROM maint_log_opt")
      .head().getLong(0) == (0L until 40L).map(_ * 2).sum)
  }

  test("CONVERT statement: both directions register readable tables; refusals") {
    // Iceberg → Delta
    val ice = freshBase("conv_ice")
    IcebergInterop.overwrite(
      spark.range(100).toDF("id").repartitionByRange(2, col("id")), ice)
    GraftSql.registerIcebergTable(spark, "maint_conv_src", ice)
    val dl = freshBase("conv_delta_dst")
    val res = GraftSql.sql(spark,
      s"CONVERT maint_conv_src TO DELTA AS maint_conv_d LOCATION '$dl'")
    assert(res.select("operation").head().getString(0) == "CONVERT")
    assert(spark.sql("SELECT sum(id) AS s FROM maint_conv_d")
      .head().getLong(0) == (0L until 100L).sum)
    // Delta → Iceberg, statement-chained off the converted table
    val ice2 = freshBase("conv_ice_dst")
    GraftSql.sql(spark,
      s"CONVERT maint_conv_d TO ICEBERG AS maint_conv_i LOCATION '$ice2'")
    assert(spark.sql("SELECT count(*) AS n FROM maint_conv_i")
      .head().getLong(0) == 100L)
    // same-format sources refuse
    val e1 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      s"CONVERT maint_conv_d TO DELTA AS x LOCATION '${freshBase("x1")}'"))
    assert(e1.getMessage.contains("CLONE"))
  }

  test("CONVERT from a graft-log table: DV state carries, both targets exact") {
    // FULLY zero-copy, vectored-delete state included: the log's DV
    // sidecars share the row-index coordinate system with both targets'
    // merge-on-read encodings, so deleted positions TRANSLATE (Delta
    // DVs / Iceberg position deletes) — no purge, no data file touched;
    // the tracked min/max carry as stats
    val log = freshBase("conv_log")
    // clustered write so the log TRACKS per-file min/max on k (plain
    // overwrite records none) — the convert must carry them
    GraftLog.overwriteClustered(
      (0L until 40L).map(k => (k, k * 2)).toDF("k", "v"), log,
      clusterCols = Seq("k"), nFiles = 4)
    GraftLog.deleteVectored(spark, log, col("k") < 10)
    val preConvertFiles = GraftLog.snapshot(log).files
      .map(p => graft.sources.PathCodec.absNorm(s"$log/$p")).toSet
    GraftSql.registerTable(spark, "maint_conv_log", log)
    val dl = freshBase("conv_log_delta")
    GraftSql.sql(spark,
      s"CONVERT maint_conv_log TO DELTA AS maint_conv_ld LOCATION '$dl'")
    assert(spark.sql("SELECT sum(v) AS s FROM maint_conv_ld")
      .head().getLong(0) == (10L until 40L).map(_ * 2).sum)
    // zero copy WITHOUT purging: every Delta add IS an ORIGINAL
    // graft-log data file (DV-referenced ones included), and the
    // soft-deleted state rides as real Delta deletion vectors
    val dsnap = graft.sources.DeltaInterop.snapshot(spark, dl)
    dsnap.files.foreach { f =>
      assert(preConvertFiles.contains(graft.sources.PathCodec.absNorm(
        graft.sources.DeltaInterop.resolveDataFile(dl, f.path))),
        s"converted add ${f.path} is not an original graft-log file — " +
        "the convert rewrote data")
    }
    assert(dsnap.files.flatMap(_.dv).map(_.cardinality).sum == 10L,
      "deleted positions did not translate into deletion vectors")
    assert(dsnap.writerFeatureSet.contains("deletionVectors"))
    // stats carried: a narrow range on k opens a strict file subset
    val narrow = graft.sources.DeltaInterop.readRange(spark, dl, "k",
      Some(35L), None)
    assert(narrow.count() == 5)
    assert(narrow.inputFiles.length <
      graft.sources.DeltaInterop.read(spark, dl).inputFiles.length,
      "graft-log stats did not carry into add.stats")
    // the Iceberg direction off the SAME source: deletes ride as
    // position-delete files (merge-on-read), values exact
    val ice = freshBase("conv_log_ice")
    GraftSql.sql(spark,
      s"CONVERT maint_conv_log TO ICEBERG AS maint_conv_li LOCATION '$ice'")
    assert(spark.sql("SELECT sum(v) AS s FROM maint_conv_li")
      .head().getLong(0) == (10L until 40L).map(_ * 2).sum)
    val isnap = graft.sources.IcebergInterop.snapshot(spark, ice)
    assert(isnap.deletes.nonEmpty,
      "deleted positions did not translate into position deletes")
    isnap.files.foreach(f => assert(preConvertFiles.contains(
      graft.sources.PathCodec.absNorm(f.path))))
    // the source stays live and independently writable
    GraftLog.append((100L until 103L).map(k => (k, k)).toDF("k", "v"), log)
    assert(GraftLog.read(spark, log).count() == 33)
    assert(spark.sql("SELECT count(*) AS n FROM maint_conv_ld")
      .head().getLong(0) == 30L, "source DML leaked into the convert")
  }

  test("CONVERT graft-log TO ICEBERG3: DV state re-frames as puffin vectors") {
    val log = freshBase("conv_log3")
    GraftLog.overwriteClustered(
      (0L until 30L).map(k => (k, k * 3)).toDF("k", "v"), log,
      clusterCols = Seq("k"), nFiles = 3)
    GraftLog.deleteVectored(spark, log, col("k") % 6 === 1)
    val preConvertFiles = GraftLog.snapshot(log).files
      .map(p => graft.sources.PathCodec.absNorm(s"$log/$p")).toSet
    GraftSql.registerTable(spark, "maint_conv_log3", log)
    val ice = freshBase("conv_log3_ice")
    GraftSql.sql(spark,
      s"CONVERT maint_conv_log3 TO ICEBERG3 AS maint_conv_l3 LOCATION '$ice'")
    assert(spark.sql("SELECT sum(v) AS s FROM maint_conv_l3")
      .head().getLong(0) == (0L until 30L).filterNot(_ % 6 == 1).map(_ * 3).sum)
    val isnap = graft.sources.IcebergInterop.snapshot(spark, ice)
    assert(isnap.formatVersion == 3)
    assert(isnap.deletes.nonEmpty && isnap.deletes.forall(_.dv),
      s"graft-log DV state must land as v3 deletion vectors: ${isnap.deletes}")
    assert(isnap.deletes.map(_.recordCount).sum == 5)
    isnap.files.foreach(f => assert(preConvertFiles.contains(
      graft.sources.PathCodec.absNorm(f.path)),
      "the v3 convert rewrote a data file"))
    // the converted table's own v3 DML composes on the carried vectors
    GraftSql.sql(spark, "DELETE FROM maint_conv_l3 WHERE k = 0")
    assert(spark.sql("SELECT count(*) AS n FROM maint_conv_l3")
      .head().getLong(0) == 24L)
  }

  test("RESTORE TABLE returns a graft-log table to a pre-DML version") {
    val base = freshBase("log_restore")
    GraftLog.overwriteClustered(
      (0L until 50L).map(k => (k, k % 5)).toDF("k", "g"), base,
      Seq("k"), nFiles = 2)
    val v1 = GraftLog.snapshot(base).version
    GraftLog.delete(spark, base, col("g") === 3)
    GraftSql.registerTable(spark, "maint_log_restore", base)
    assert(spark.table("maint_log_restore").count() == 40L)
    GraftSql.sql(spark, s"RESTORE TABLE maint_log_restore TO VERSION AS OF $v1")
    // the restore is a NEW version on top; content matches v1 exactly
    assert(GraftLog.snapshot(base).version > v1 + 1)
    assert(spark.table("maint_log_restore").count() == 50L)
    assert(GraftLog.read(spark, base).agg(sum("k")).head().getLong(0) ==
      (0L until 50L).sum)
  }

  test("graft-log RESTORE refuses when the needed files were vacuumed") {
    val base = freshBase("log_restore_vac")
    GraftLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), base)
    val v1 = GraftLog.snapshot(base).version
    GraftLog.overwrite(Seq((9L, "z")).toDF("k", "s"), base)
    // files gone but the log entry still there → the restore's own check
    GraftLog.snapshot(base, Some(v1)).files
      .foreach(f => new File(base, f).delete())
    val e = intercept[IllegalArgumentException] {
      GraftLog.restore(spark, base, v1)
    }
    assert(e.getMessage.contains("vacuumed"))
    // after a squashing vacuum the version itself is unresolvable — loud
    GraftLog.vacuum(base, keepVersions = 1, retentionMs = 0L)
    val e2 = intercept[IllegalArgumentException] {
      GraftLog.restore(spark, base, v1)
    }
    assert(e2.getMessage.contains("not found"))
  }

  test("VACUUM RETAIN 0 HOURS deletes graft-log files no version needs") {
    val base = freshBase("log_vac")
    GraftLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), base)
    GraftLog.overwrite(Seq((3L, "c")).toDF("k", "s"), base)
    GraftSql.registerTable(spark, "maint_log_vac", base)
    val res = GraftSql.sql(spark, "VACUUM maint_log_vac RETAIN 0 HOURS")
    assert(res.select("n_removed").head().getLong(0) >= 1L)
    assert(spark.table("maint_log_vac").as[(Long, String)].collect().toSeq ==
      Seq((3L, "c")))
  }

  test("OPTIMIZE and ZORDER BY run Delta's compaction/clustering") {
    val base = freshBase("delta_opt")
    DeltaInterop.overwrite(
      (0L until 60L).map(k => (k, k % 3)).toDF("k", "g").repartition(6), base)
    GraftSql.registerDeltaTable(spark, "maint_delta_opt", base)
    val before = DeltaInterop.snapshot(spark, base).files.size
    GraftSql.sql(spark, "OPTIMIZE maint_delta_opt")
    val afterOpt = DeltaInterop.snapshot(spark, base).files.size
    assert(afterOpt < before)
    GraftSql.sql(spark, "OPTIMIZE maint_delta_opt ZORDER BY (k, g)")
    assert(spark.sql("SELECT sum(k) AS s FROM maint_delta_opt")
      .head().getLong(0) == (0L until 60L).sum)
  }

  test("RESTORE + VACUUM round-trip on Delta through SQL") {
    val base = freshBase("delta_restore")
    DeltaInterop.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), base)
    val v0 = DeltaInterop.snapshot(spark, base).version
    DeltaInterop.overwrite(Seq((9L, 90.0)).toDF("k", "v"), base)
    GraftSql.registerDeltaTable(spark, "maint_delta_restore", base)
    GraftSql.sql(spark,
      s"RESTORE TABLE maint_delta_restore TO VERSION AS OF $v0")
    assert(spark.table("maint_delta_restore").as[(Long, Double)]
      .collect().sorted.toSeq == Seq((1L, 10.0), (2L, 20.0)))
    // vacuum with no retention still keeps every live file
    GraftSql.sql(spark, "VACUUM maint_delta_restore RETAIN 0 HOURS")
    assert(spark.table("maint_delta_restore").count() == 2L)
  }

  test("OPTIMIZE bin-packs Iceberg small files; RESTORE rolls back") {
    val base = freshBase("ice_opt")
    IcebergInterop.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), base)
    val firstSnap = IcebergInterop.snapshotIds(base).head
    IcebergInterop.append(Seq((3L, "c")).toDF("k", "s"), base)
    IcebergInterop.append(Seq((4L, "d")).toDF("k", "s"), base)
    GraftSql.registerIcebergTable(spark, "maint_ice_opt", base)
    val before = IcebergInterop.snapshot(spark, base).files.size
    GraftSql.sql(spark, "OPTIMIZE maint_ice_opt")
    assert(IcebergInterop.snapshot(spark, base).files.size < before)
    assert(spark.sql("SELECT sum(k) AS s FROM maint_ice_opt")
      .head().getLong(0) == 10L)
    // RESTORE on Iceberg takes the snapshot id (its rollback unit)
    GraftSql.sql(spark,
      s"RESTORE TABLE maint_ice_opt TO VERSION AS OF $firstSnap")
    assert(spark.table("maint_ice_opt").count() == 2L)
  }

  test("VACUUM on Iceberg removes orphan files, never live ones") {
    val base = freshBase("ice_vac")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    // a stray data file no snapshot references
    val orphan = new File(base, "data/orphan-000.parquet")
    orphan.getParentFile.mkdirs()
    java.nio.file.Files.writeString(orphan.toPath, "junk")
    GraftSql.registerIcebergTable(spark, "maint_ice_vac", base)
    val res = GraftSql.sql(spark, "VACUUM maint_ice_vac RETAIN 0 HOURS")
    assert(res.select("n_removed").head().getLong(0) >= 1L)
    assert(!orphan.exists())
    assert(spark.table("maint_ice_vac").count() == 1L)
  }

  test("graft-log SQL VACUUM keeps in-window versions time-travelable") {
    val base = freshBase("log_vac_window")
    GraftLog.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    GraftLog.overwrite(Seq((2L, "b")).toDF("k", "s"), base)
    GraftSql.registerTable(spark, "maint_vac_window", base)
    // a generous window: both versions are recent → history survives
    GraftSql.sql(spark, "VACUUM maint_vac_window RETAIN 168 HOURS")
    assert(GraftSql.sql(spark, "DESCRIBE HISTORY maint_vac_window")
      .count() >= 2L)
    assert(GraftLog.read(spark, base, version = Some(1L)).count() == 1L)
    // RETAIN 0: everything out of window → squash to the head
    GraftSql.sql(spark, "VACUUM maint_vac_window RETAIN 0 HOURS")
    assert(spark.table("maint_vac_window").count() == 1L)
  }

  test("DESCRIBE HISTORY of an unregistered name falls through to Spark") {
    import spark.implicits._
    // a table literally named `history`: DESCRIBE history <col> is
    // Spark's describe-column syntax and must NOT be hijacked
    Seq((1L, "a")).toDF("k", "s").createOrReplaceTempView("history")
    val desc = GraftSql.sql(spark, "DESCRIBE history k")
    assert(desc.columns.contains("info_name") ||
      desc.columns.contains("col_name"))
  }

  test("DESCRIBE HISTORY returns each format's commit log") {
    val lbase = freshBase("hist_log")
    GraftLog.overwrite(Seq((1L, "a")).toDF("k", "s"), lbase)
    GraftLog.delete(spark, lbase, col("k") === 1L)
    GraftSql.registerTable(spark, "maint_hist_log", lbase)
    val lh = GraftSql.sql(spark, "DESCRIBE HISTORY maint_hist_log")
    assert(lh.count() >= 2L)
    assert(lh.columns.contains("operation"))

    val dbase = freshBase("hist_delta")
    DeltaInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), dbase)
    GraftSql.registerDeltaTable(spark, "maint_hist_delta", dbase)
    assert(GraftSql.sql(spark, "DESC HISTORY maint_hist_delta").count() >= 1L)

    val ibase = freshBase("hist_ice")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), ibase)
    GraftSql.registerIcebergTable(spark, "maint_hist_ice", ibase)
    val ih = GraftSql.sql(spark, "DESCRIBE HISTORY maint_hist_ice")
    assert(ih.columns.contains("snapshot_id") && ih.count() >= 1L)
  }

  test("maintenance on an unregistered table refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "OPTIMIZE no_such_maint_table")
    }
    assert(e.getMessage.contains("not a registered"))
    val z = intercept[IllegalArgumentException] {
      val base = freshBase("zorder_refuse")
      GraftLog.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
      GraftSql.registerTable(spark, "maint_zorder_refuse", base)
      GraftSql.sql(spark, "OPTIMIZE maint_zorder_refuse ZORDER BY (k)")
    }
    assert(z.getMessage.contains("ZORDER"))
  }

  test("DESCRIBE DETAIL summarizes from metadata; SHOW TBLPROPERTIES") {
    val dbase = freshBase("detail_delta")
    DeltaInterop.overwrite(
      (0L until 20L).map(k => (k, (k % 2).toString)).toDF("k", "g"),
      dbase, partitionBy = Seq("g"),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    GraftSql.registerDeltaTable(spark, "maint_detail_delta", dbase)
    val d = GraftSql.sql(spark, "DESCRIBE DETAIL maint_detail_delta").head()
    assert(d.getAs[String]("format") == "delta")
    assert(d.getAs[scala.collection.Seq[String]]("partition_columns")
      .toSeq == Seq("g"))
    assert(d.getAs[Long]("num_files") >= 2L) // one per partition minimum
    assert(d.getAs[Long]("size_in_bytes") > 0L)
    val props = GraftSql.sql(spark,
      "SHOW TBLPROPERTIES maint_detail_delta")
      .as[(String, String)].collect().toMap
    assert(props("delta.enableChangeDataFeed") == "true")
    // single-key form
    assert(GraftSql.sql(spark,
      "SHOW TBLPROPERTIES maint_detail_delta (delta.enableChangeDataFeed)")
      .head().getString(1) == "true")

    val lbase = freshBase("detail_log")
    GraftLog.overwrite(Seq((1L, "a")).toDF("k", "s"), lbase)
    GraftSql.registerTable(spark, "maint_detail_log", lbase)
    val l = GraftSql.sql(spark, "DESCRIBE DETAIL maint_detail_log").head()
    assert(l.getAs[String]("format") == "graftlog")
    assert(l.getAs[Long]("num_files") >= 1L)

    val ibase = freshBase("detail_ice")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), ibase)
    GraftSql.registerIcebergTable(spark, "maint_detail_ice", ibase)
    val i = GraftSql.sql(spark, "DESCRIBE DETAIL maint_detail_ice").head()
    assert(i.getAs[String]("format") == "iceberg")
    assert(i.getAs[Long]("size_in_bytes") > 0L)
  }

  test("VACUUM DRY RUN reports reclaimable files, deletes nothing") {
    val dbase = freshBase("dry_delta")
    DeltaInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), dbase)
    DeltaInterop.overwrite(Seq((2L, "b")).toDF("k", "s"), dbase)
    GraftSql.registerDeltaTable(spark, "maint_dry_delta", dbase)
    val dry = GraftSql.sql(spark,
      "VACUUM maint_dry_delta RETAIN 0 HOURS DRY RUN")
    assert(dry.select("operation").head().getString(0) == "VACUUM DRY RUN")
    val wouldRemove = dry.select("n_removed").head().getLong(0)
    assert(wouldRemove >= 1L)
    // nothing was touched: the old version still time-travels
    assert(DeltaInterop.read(spark, dbase, Some(0L)).count() == 1L)
    // the real vacuum then reclaims exactly what the preview promised
    val real = GraftSql.sql(spark, "VACUUM maint_dry_delta RETAIN 0 HOURS")
    assert(real.select("n_removed").head().getLong(0) == wouldRemove)
    // graft-log refuses the preview (its vacuum squashes the log)
    val lbase = freshBase("dry_log")
    GraftLog.overwrite(Seq((1L, "a")).toDF("k", "s"), lbase)
    GraftSql.registerTable(spark, "maint_dry_log", lbase)
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "VACUUM maint_dry_log RETAIN 0 HOURS DRY RUN")
    }
    assert(e.getMessage.contains("preview"))
  }

  test("SHOW CREATE TABLE round-trips the definition through this front-end") {
    val dbase = freshBase("showcreate_delta")
    GraftSql.sql(spark,
      s"""CREATE TABLE maint_sc_t (k BIGINT, g STRING, v DECIMAL(18,2))
          USING delta PARTITIONED BY (g)
          TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')
          LOCATION '$dbase'""")
    val ddl = GraftSql.sql(spark, "SHOW CREATE TABLE maint_sc_t")
      .head().getString(0)
    assert(ddl.contains("USING delta") && ddl.contains("PARTITIONED BY (g)")
      && ddl.contains("delta.enableChangeDataFeed"))
    // execute the emitted DDL at a NEW location under a NEW name:
    // the definition must reproduce exactly
    val d2 = freshBase("showcreate_delta2")
    GraftSql.sql(spark, ddl
      .replace("maint_sc_t", "maint_sc_t2")
      .replace(dbase, d2))
    val det = GraftSql.sql(spark, "DESCRIBE DETAIL maint_sc_t2").head()
    assert(det.getAs[scala.collection.Seq[String]]("partition_columns")
      .toSeq == Seq("g"))
    assert(GraftSql.sql(spark, "SHOW TBLPROPERTIES maint_sc_t2")
      .as[(String, String)].collect().toMap
      .get("delta.enableChangeDataFeed").contains("true"))
    assert(spark.table("maint_sc_t2").schema.fieldNames.toSeq ==
      Seq("k", "g", "v"))
    // iceberg + graft-log render too
    val ibase = freshBase("showcreate_ice")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), ibase)
    GraftSql.registerIcebergTable(spark, "maint_sc_ice", ibase)
    assert(GraftSql.sql(spark, "SHOW CREATE TABLE maint_sc_ice")
      .head().getString(0).contains("USING iceberg"))
    // an identity-column table refuses rather than lying
    val idbase = freshBase("showcreate_id")
    DeltaInterop.overwriteIdentity(
      Seq((10.0, "x")).toDF("v", "s"), idbase, "id")
    GraftSql.registerDeltaTable(spark, "maint_sc_id", idbase)
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "SHOW CREATE TABLE maint_sc_id")
    }
    assert(e.getMessage.contains("identity"))
  }

  test("SHOW CREATE TABLE round-trips transformed Iceberg partition specs") {
    val base = freshBase("showcreate_icet")
    // transformed spec straight through SQL — the grammar SHOW CREATE
    // TABLE emits must also be accepted on the way in
    GraftSql.sql(spark,
      s"""CREATE TABLE maint_sc_icet (k BIGINT, d DATE, s STRING)
          USING iceberg
          PARTITIONED BY (bucket(4, k), days(d), truncate(2, s))
          LOCATION '$base'""")
    GraftSql.sql(spark,
      "INSERT INTO maint_sc_icet SELECT * FROM VALUES " +
      "(CAST(1 AS BIGINT), DATE'2024-01-01', 'aa'), " +
      "(CAST(2 AS BIGINT), DATE'2024-01-02', 'bb') AS t(k, d, s)")
    val sn = IcebergInterop.snapshot(spark, base)
    assert(sn.specFields.map(_.transform) ==
      Seq("bucket[4]", "day", "truncate[2]"))
    val ddl = GraftSql.sql(spark, "SHOW CREATE TABLE maint_sc_icet")
      .head().getString(0)
    assert(ddl.contains("bucket(4, k)") && ddl.contains("days(d)")
      && ddl.contains("truncate(2, s)"), ddl)
    // executing the emitted DDL reproduces the SAME spec elsewhere
    val b2 = freshBase("showcreate_icet2")
    GraftSql.sql(spark,
      ddl.replace("maint_sc_icet", "maint_sc_icet3").replace(base, b2))
    GraftSql.sql(spark,
      "INSERT INTO maint_sc_icet3 SELECT * FROM VALUES " +
      "(CAST(7 AS BIGINT), DATE'2024-02-02', 'zz') AS t(k, d, s)")
    val sn2 = IcebergInterop.snapshot(spark, b2)
    assert(sn2.specFields.map(_.transform) ==
      Seq("bucket[4]", "day", "truncate[2]"))
    assert(spark.table("maint_sc_icet3").count() == 1L)
  }

  test("restore folds deletion vectors with their version") {
    val base = freshBase("log_restore_dv")
    GraftLog.overwriteClustered(
      (0L until 30L).map(k => (k, k)).toDF("k", "v"), base,
      Seq("k"), nFiles = 2)
    // v+1: merge-on-read delete (adds a DV, no data file touched)
    GraftLog.deleteVectored(spark, base, col("k") < 10)
    val vDv = GraftLog.snapshot(base).version
    assert(GraftLog.read(spark, base).count() == 20L)
    // v+2: copy-on-write delete of more rows
    GraftLog.delete(spark, base, col("k") >= 25)
    assert(GraftLog.read(spark, base).count() == 15L)
    // restoring to the DV version brings the DV back exactly
    GraftLog.restore(spark, base, vDv)
    assert(GraftLog.read(spark, base).as[(Long, Long)].collect().map(_._1)
      .sorted.toSeq == (10L until 30L).toSeq)
  }

  test("RESTORE TO TIMESTAMP AS OF resolves per-format clocks " +
       "(Delta ICT, Iceberg snapshot-log)") {
    // Delta: the in-commit timestamps ARE the clock
    val dbase = freshBase("rts_delta")
    DeltaInterop.overwrite(spark.range(10).toDF("id"), dbase)
    DeltaInterop.withIctClock(() => 9000000000000L) {
      DeltaInterop.enableInCommitTimestamps(spark, dbase)
    }
    DeltaInterop.withIctClock(() => 9100000000000L) {
      DeltaInterop.append(spark.range(10, 14).toDF("id").coalesce(1), dbase)
    }
    DeltaInterop.withIctClock(() => 9200000000000L) {
      DeltaInterop.append(spark.range(14, 20).toDF("id").coalesce(1), dbase)
    }
    GraftSql.registerDeltaTable(spark, "rts_delta", dbase)
    // restore to between the two appends → 14 rows
    GraftSql.sql(spark,
      "RESTORE TABLE rts_delta TO TIMESTAMP AS OF '2259-01-01 00:00:00'")
    assert(spark.table("rts_delta").count() == 14)
    // Iceberg: the snapshot-log decides — across a ROLLBACK
    val ibase = freshBase("rts_ice")
    IcebergInterop.withClock(() => 1000L) {
      IcebergInterop.overwrite(spark.range(5).toDF("id").coalesce(1), ibase)
    }
    IcebergInterop.withClock(() => 2000L) {
      IcebergInterop.append(spark.range(5, 9).toDF("id").coalesce(1), ibase)
    }
    IcebergInterop.withClock(() => 3000L) {
      IcebergInterop.rollbackTo(ibase, 1L)
    }
    IcebergInterop.withClock(() => 4000L) {
      IcebergInterop.append(spark.range(20, 23).toDF("id").coalesce(1), ibase)
    }
    GraftSql.registerIcebergTable(spark, "rts_ice", ibase)
    // at epoch+3500ms the current table was the rolled-back creation
    GraftSql.sql(spark,
      "RESTORE TABLE rts_ice TO TIMESTAMP AS OF '1970-01-01 00:00:03.5'")
    assert(spark.table("rts_ice").count() == 5)
  }

  test("OPTIMIZE ... WHERE compacts ONLY the named partition") {
    // Delta: 3 partitions x 3 small files; scope to k=1
    val dbase = freshBase("opt_where_delta")
    (0 until 3).foreach { r =>
      val batch = spark.range(r * 30, r * 30 + 30)
        .select(col("id"), (col("id") % 3).cast("string").as("k"))
        .repartition(1)
      if (r == 0) DeltaInterop.overwrite(batch, dbase, partitionBy = Seq("k"))
      else DeltaInterop.append(batch, dbase, partitionBy = Seq("k"))
    }
    val before = DeltaInterop.snapshot(spark, dbase).files
    assert(before.count(_.partitionValues("k") == "1") == 3)
    GraftSql.registerDeltaTable(spark, "opt_where_d", dbase)
    GraftSql.sql(spark, "OPTIMIZE opt_where_d WHERE k = '1'")
    val after = DeltaInterop.snapshot(spark, dbase).files
    assert(after.count(_.partitionValues("k") == "1") == 1,
      "the scoped partition must compact to one file")
    // every OTHER partition's files survive BY NAME
    val untouchedBefore = before.filterNot(_.partitionValues("k") == "1")
      .map(_.path).toSet
    val untouchedAfter = after.filterNot(_.partitionValues("k") == "1")
      .map(_.path).toSet
    assert(untouchedAfter == untouchedBefore,
      "OPTIMIZE WHERE must not rewrite other partitions")
    assert(DeltaInterop.read(spark, dbase).count() == 90)
    // a non-partition column refuses
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "OPTIMIZE opt_where_d WHERE id = '5'"))
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // Iceberg: same contract
    val ibase = freshBase("opt_where_ice")
    (0 until 3).foreach { r =>
      IcebergInterop.append(
        spark.range(r * 30, r * 30 + 30)
          .select(col("id"), (col("id") % 3).as("k"))
          .repartition(1), ibase, partitionBy = Seq("k"))
    }
    val ibefore = IcebergInterop.snapshot(spark, ibase).files
    GraftSql.registerIcebergTable(spark, "opt_where_i", ibase)
    GraftSql.sql(spark, "OPTIMIZE opt_where_i WHERE k = '2'")
    val iafter = IcebergInterop.snapshot(spark, ibase).files
    assert(iafter.count(_.partitionValues.get("k").contains("2")) == 1)
    val iUntouchedBefore = ibefore
      .filterNot(_.partitionValues.get("k").contains("2")).map(_.path).toSet
    val iUntouchedAfter = iafter
      .filterNot(_.partitionValues.get("k").contains("2")).map(_.path).toSet
    assert(iUntouchedAfter == iUntouchedBefore)
    assert(IcebergInterop.read(spark, ibase).count() == 90)
  }

  test("SHOW PARTITIONS: hive-rendered tuples from log metadata only") {
    import spark.implicits._
    val dbase = freshBase("showparts_d")
    DeltaInterop.overwrite(
      (0L until 60L).map(k => (k, (k % 3).toInt, (k % 2).toInt))
        .toDF("id", "a", "b").coalesce(1),
      dbase, partitionBy = Seq("a", "b"))
    GraftSql.registerDeltaTable(spark, "showparts_d", dbase)
    val got = GraftSql.sql(spark, "SHOW PARTITIONS showparts_d")
      .as[String].collect().toSeq
    assert(got == Seq("a=0/b=0", "a=0/b=1", "a=1/b=0", "a=1/b=1",
      "a=2/b=0", "a=2/b=1"))
    // PARTITION clause filters
    assert(GraftSql.sql(spark,
      "SHOW PARTITIONS showparts_d PARTITION (a=2)")
      .as[String].collect().toSeq == Seq("a=2/b=0", "a=2/b=1"))
    // Iceberg: same surface
    val ibase = freshBase("showparts_i")
    IcebergInterop.overwrite(
      (0L until 30L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
        .repartition(2), ibase, partitionBy = Seq("p"))
    GraftSql.registerIcebergTable(spark, "showparts_i", ibase)
    assert(GraftSql.sql(spark, "SHOW PARTITIONS showparts_i")
      .as[String].collect().toSeq == Seq("p=0", "p=1", "p=2"))
    // unpartitioned refuses, matching Spark's own command
    val ubase = freshBase("showparts_u")
    DeltaInterop.overwrite((0L until 5L).toDF("id").coalesce(1), ubase)
    GraftSql.registerDeltaTable(spark, "showparts_u", ubase)
    val e = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "SHOW PARTITIONS showparts_u"))
    assert(e.getMessage.contains("not partitioned"))
    // unknown filter column refuses
    val e2 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "SHOW PARTITIONS showparts_i PARTITION (nope=1)"))
    assert(e2.getMessage.contains("nope"))
  }
}
