package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{DeltaDml, DeltaInterop}

/** Row tracking (public Delta protocol §Row Tracking): stable row ids
  * assigned at commit time — baseRowId + position until a rewrite
  * MATERIALIZES them into the file, a domainMetadata high-water mark
  * gating allocation, and id stability across DV deletes (positions
  * never move) and copy-on-write UPDATE (ids travel in the
  * materialized column). */
class DeltaRowTrackingSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("delta_rt_").toFile
    d.deleteOnExit(); d.getPath
  }

  /** One-file table of (id, v) rows 0..n-1 in id order, row tracking
    * enabled — row_id == id by construction. */
  private def tracked(n: Int): String = {
    val base = tmp()
    DeltaInterop.overwrite(
      spark.range(n).toDF("id").withColumn("v", lit(1L))
        .coalesce(1).sortWithinPartitions("id"), base)
    DeltaInterop.enableRowTracking(spark, base)
    base
  }

  test("enable backfills ids and readWithRowIds resolves them") {
    val base = tracked(10)
    val got = DeltaInterop.readWithRowIds(spark, base)
      .orderBy("id").collect()
    assert(got.map(_.getAs[Long]("_row_id")).toSeq == (0L until 10L))
    // backfilled rows default to the enabling commit's version
    assert(got.map(_.getAs[Long]("_row_commit_version")).distinct.toSeq ==
      Seq(1L))
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.rowTrackingEnabled)
    assert(snap.rowIdHighWaterMark == 9L)
    assert(snap.files.forall(_.baseRowId.isDefined))
    assert(snap.writerFeatureSet.contains("rowTracking"))
    assert(snap.writerFeatureSet.contains("domainMetadata"))
    assert(snap.minWriterVersion == 7)
  }

  test("appends allocate fresh id ranges above the high-water mark") {
    val base = tracked(10)
    DeltaInterop.append(
      spark.range(100, 105).toDF("id").withColumn("v", lit(2L))
        .coalesce(1).sortWithinPartitions("id"), base)
    val got = DeltaInterop.readWithRowIds(spark, base)
    assert(got.count() == 15)
    assert(got.agg(max("_row_id")).head().getLong(0) == 14L)
    val appended = got.filter(col("id") >= 100).orderBy("id").collect()
    assert(appended.map(_.getAs[Long]("_row_id")).toSeq == (10L until 15L))
    assert(appended.map(_.getAs[Long]("_row_commit_version")).distinct
      .toSeq == Seq(2L))
    assert(DeltaInterop.snapshot(spark, base).rowIdHighWaterMark == 14L)
  }

  test("DV delete never moves surviving ids") {
    val base = tracked(10)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") % 3 === 0)
    val got = DeltaInterop.readWithRowIds(spark, base).orderBy("id").collect()
    assert(got.length == 6)
    // id column == row id by construction, so survivors must still match
    got.foreach(r =>
      assert(r.getAs[Long]("_row_id") == r.getAs[Long]("id")))
  }

  test("copy-on-write UPDATE materializes preserved ids; versions split") {
    val base = tracked(10)
    val v = DeltaDml.updateWhere(spark, base, col("id") >= 7,
      Map("v" -> lit(9L)))
    val got = DeltaInterop.readWithRowIds(spark, base).orderBy("id").collect()
    assert(got.length == 10)
    got.foreach(r =>
      assert(r.getAs[Long]("_row_id") == r.getAs[Long]("id"),
        s"row ${r.getAs[Long]("id")} lost its id in the rewrite"))
    // updated rows moved to the UPDATE's commit version; survivors in
    // the SAME rewritten file keep their original one (materialized)
    got.foreach { r =>
      val want = if (r.getAs[Long]("id") >= 7) v else 1L
      assert(r.getAs[Long]("_row_commit_version") == want)
    }
    assert(got.filter(_.getAs[Long]("id") >= 7)
      .forall(_.getAs[Long]("v") == 9L))
    // the rewrite allocated a fresh (unused) base range — hwm advanced
    assert(DeltaInterop.snapshot(spark, base).rowIdHighWaterMark >= 9L)
  }

  test("update-then-delete-then-append: ids stay consistent end to end") {
    val base = tracked(20)
    DeltaDml.updateWhere(spark, base, col("id") < 5, Map("v" -> lit(7L)))
    DeltaDml.deleteVectoredWhere(spark, base, col("id") % 4 === 1)
    DeltaInterop.append(
      spark.range(200, 203).toDF("id").withColumn("v", lit(3L))
        .coalesce(1).sortWithinPartitions("id"), base)
    val got = DeltaInterop.readWithRowIds(spark, base)
    val olds = got.filter(col("id") < 200).collect()
    olds.foreach(r =>
      assert(r.getAs[Long]("_row_id") == r.getAs[Long]("id")))
    // the UPDATE rewrite burned a fresh base range (ids are unique and
    // stable, not dense — same shape as Delta's own allocator), so the
    // append's ids are simply contiguous above everything live
    val news = got.filter(col("id") >= 200).orderBy("id").collect()
    val newIds = news.map(_.getAs[Long]("_row_id")).toSeq
    assert(newIds == (newIds.head until newIds.head + 3))
    assert(newIds.head > olds.map(_.getAs[Long]("_row_id")).max)
    // all ids unique
    val ids = got.select("_row_id").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("row-tracking state survives checkpoint replay") {
    val base = tracked(10)
    DeltaInterop.append(
      spark.range(50, 55).toDF("id").withColumn("v", lit(2L))
        .coalesce(1).sortWithinPartitions("id"), base)
    val cpv = DeltaInterop.checkpoint(spark, base)
    // force true checkpoint dependence: drop the JSON commits the
    // checkpoint covers (the q221 pattern)
    val log = new java.io.File(base, "_delta_log")
    (0L to cpv).foreach { v =>
      new java.io.File(log, f"$v%020d.json").delete()
    }
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.rowIdHighWaterMark == 14L,
      "domainMetadata must survive checkpointing")
    assert(snap.files.forall(_.baseRowId.isDefined),
      "add.baseRowId must survive checkpointing")
    val got = DeltaInterop.readWithRowIds(spark, base).orderBy("id").collect()
    assert(got.map(_.getAs[Long]("_row_id")).toSeq ==
      ((0L until 10L) ++ (10L until 15L)))
  }

  test("MERGE preserves matched ids and mints fresh ones for inserts") {
    import spark.implicits._
    val base = tracked(10)
    // keys 3,4 match (update), 100,101 insert
    DeltaDml.mergeUpsert(spark, base,
      Seq((3L, 30L), (4L, 40L), (100L, 7L), (101L, 7L))
        .toDF("id", "v"), "id")
    val got = DeltaInterop.readWithRowIds(spark, base).orderBy("id").collect()
    assert(got.length == 12)
    // matched rows keep their pre-merge ids (id == row_id by construction)
    got.filter(_.getAs[Long]("id") < 100).foreach { r =>
      assert(r.getAs[Long]("_row_id") == r.getAs[Long]("id"),
        s"row ${r.getAs[Long]("id")} lost its id in the merge")
    }
    // matched rows moved to the merge's commit version; untouched
    // survivors in the rewritten file keep their original one
    val verByCase = got.filter(_.getAs[Long]("id") < 100)
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("_row_commit_version")))
    verByCase.foreach { case (id, ver) =>
      if (id == 3L || id == 4L) assert(ver == 2L, s"id $id ver $ver")
      else assert(ver == 1L, s"id $id ver $ver")
    }
    assert(got.filter(r => r.getAs[Long]("id") == 3L)
      .forall(_.getAs[Long]("v") == 30L))
    // inserted rows got fresh unique ids above the old live set
    val insIds = got.filter(_.getAs[Long]("id") >= 100)
      .map(_.getAs[Long]("_row_id")).toSeq
    assert(insIds.forall(_ > 9L) && insIds.distinct.length == 2)
    val all = got.map(_.getAs[Long]("_row_id")).toSeq
    assert(all.distinct.length == all.length, "row ids must stay unique")
  }

  test("OPTIMIZE, REORG and ZORDER materialize ids through rewrites") {
    val base = tracked(10)
    // split history: enable(1) + two appends → 3 files, then a DV
    // delete → OPTIMIZE folds everything, REORG purges vectors; every
    // surviving row must keep its id AND its original commit version
    DeltaInterop.append(
      spark.range(100, 105).toDF("id").withColumn("v", lit(2L))
        .coalesce(1).sortWithinPartitions("id"), base)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") % 5 === 2)
    val before = DeltaInterop.readWithRowIds(spark, base)
      .orderBy("id")
      .select("id", "_row_id", "_row_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(DeltaInterop.optimize(spark, base).isDefined)
    val afterOpt = DeltaInterop.readWithRowIds(spark, base)
      .orderBy("id")
      .select("id", "_row_id", "_row_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(afterOpt == before,
      "OPTIMIZE must preserve every (id, row_id, commit_version) triple")
    // a fresh DV delete then REORG: the purge rewrite keeps ids too
    DeltaDml.deleteVectoredWhere(spark, base, col("id") === 101)
    DeltaInterop.reorgPurge(spark, base)
    val afterReorg = DeltaInterop.readWithRowIds(spark, base)
      .orderBy("id")
      .select("id", "_row_id", "_row_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(afterReorg == before.filterNot(_._1 == 101L))
    assert(DeltaInterop.snapshot(spark, base).files
      .forall(_.dv.forall(_.cardinality == 0)))
    // ZORDER re-clusters rows across files — ids and versions must
    // materialize through the re-layout too
    DeltaInterop.optimizeZorder(spark, base, Seq("v"), filesPerPartition = 3)
    val afterZ = DeltaInterop.readWithRowIds(spark, base)
      .orderBy("id")
      .select("id", "_row_id", "_row_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(afterZ == before.filterNot(_._1 == 101L),
      "ZORDER must preserve every (id, row_id, commit_version) triple")
  }

  test("RESTORE keeps the id mark monotone; pre-enable restore refuses writes") {
    val base = tracked(10) // v1 = enable
    DeltaInterop.append(
      spark.range(50, 55).toDF("id").withColumn("v", lit(2L))
        .coalesce(1).sortWithinPartitions("id"), base) // v2, ids 10..14
    DeltaInterop.restore(spark, base, 1L) // drop the append
    // restored rows keep their backfilled ids; the high-water mark
    // does NOT regress (protocol: ids are unique across all history —
    // time-travel readers of v2 still own 10..14)
    val got = DeltaInterop.readWithRowIds(spark, base)
    assert(got.count() == 10)
    assert(DeltaInterop.snapshot(spark, base).rowIdHighWaterMark == 14L,
      "RESTORE must not regress the row-id high-water mark")
    DeltaInterop.append(
      spark.range(70, 72).toDF("id").withColumn("v", lit(3L))
        .coalesce(1).sortWithinPartitions("id"), base)
    val ids = DeltaInterop.readWithRowIds(spark, base)
      .select("_row_id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.length == 12)
    assert(ids.max == 16L, "post-restore append allocates above the mark")
    // restoring to BEFORE enablement leaves feature-declared-but-not-
    // enabled (the protocol action is history, the property rolls
    // back) — writes refuse loudly; re-enabling repairs, monotone
    val base2 = tmp()
    DeltaInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base2) // v0
    DeltaInterop.enableRowTracking(spark, base2) // v1
    DeltaInterop.restore(spark, base2, 0L) // v2: property off, feature on
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.append(spark.range(5, 8).toDF("id").coalesce(1), base2)
    }
    assert(e.getMessage.contains("rowTracking"))
    DeltaInterop.enableRowTracking(spark, base2) // re-enable re-backfills
    val ids2 = DeltaInterop.readWithRowIds(spark, base2)
      .select("_row_id").collect().map(_.getLong(0)).toSeq
    // the re-backfill allocates ABOVE the surviving mark (old 0..4 are
    // burned with the un-restored state)
    assert(ids2.length == 5 && ids2.min == 5L)
  }

  test("rowTracking declared without enablement refuses writes") {
    // a foreign writer's "supported but not enabled" table: the feature
    // obliges fresh id assignment on every commit, state this engine
    // maintains only via the enableRowTracking shape — refuse loudly
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    Files.write(
      new java.io.File(base, "_delta_log/00000000000000000001.json").toPath,
      ("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
       """"writerFeatures":["rowTracking","domainMetadata"]}}""" + "\n")
        .getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException] {
      DeltaInterop.append(spark.range(3).toDF("id"), base)
    }
    assert(e1.getMessage.contains("rowTracking"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaDml.updateWhere(spark, base, col("id") < 5,
        Map("id" -> lit(0L)))
    }
    assert(e2.getMessage.contains("rowTracking"))
    // enableRowTracking is the supported → enabled transition
    DeltaInterop.enableRowTracking(spark, base)
    DeltaInterop.append(spark.range(20, 23).toDF("id").coalesce(1), base)
    val ids = DeltaInterop.readWithRowIds(spark, base)
      .select("_row_id").collect().map(_.getLong(0))
    assert(ids.length == 13 && ids.distinct.length == 13)
  }

  test("SQL TBLPROPERTIES routes row-tracking enablement through the upgrade") {
    import graft.pipeline.GraftSql
    val base = tmp()
    DeltaInterop.overwrite(spark.range(8).toDF("id").coalesce(1), base)
    GraftSql.registerDeltaTable(spark, "rt_sql_t", base)
    GraftSql.sql(spark,
      "ALTER TABLE rt_sql_t SET TBLPROPERTIES " +
      "('delta.enableRowTracking' = 'true')")
    val snap = DeltaInterop.snapshot(spark, base)
    // a bare property flip would leave no backfill/domain — the SQL
    // path must run the full upgrade
    assert(snap.rowTrackingEnabled)
    assert(snap.rowIdHighWaterMark == 7L)
    assert(snap.files.forall(_.baseRowId.isDefined))
    assert(DeltaInterop.readWithRowIds(spark, base).count() == 8)
    // disabling and engine-managed keys refuse
    val e1 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ALTER TABLE rt_sql_t SET TBLPROPERTIES " +
      "('delta.enableRowTracking' = 'false')"))
    assert(e1.getMessage.contains("disabling"))
    val e2 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ALTER TABLE rt_sql_t SET TBLPROPERTIES " +
      "('delta.rowTracking.materializedRowIdColumnName' = 'x')"))
    assert(e2.getMessage.contains("engine-managed"))
  }

  test("row tracking composes with Change Data Feed") {
    import spark.implicits._
    val base = tmp()
    DeltaInterop.overwrite(
      spark.range(10).toDF("id").withColumn("v", lit(1L))
        .coalesce(1).sortWithinPartitions("id"), base,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaInterop.enableRowTracking(spark, base) // v1
    // the enable's backfill re-adds are dataChange=false: no change rows
    assert(DeltaDml.readChangeFeed(spark, base, fromVersion = 1L)
      .filter(col("_commit_version") === 1L).count() == 0)
    DeltaDml.updateWhere(spark, base, col("id") < 3,
      Map("v" -> lit(5L)))                                  // v2
    DeltaDml.deleteVectoredWhere(spark, base, col("id") === 7) // v3
    DeltaDml.mergeUpsert(spark, base,
      Seq((4L, 9L), (100L, 9L)).toDF("id", "v"), "id")      // v4
    val feed = DeltaDml.readChangeFeed(spark, base, fromVersion = 2L)
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map(
      "update_preimage" -> 4L,  // 3 from UPDATE + 1 merge-matched
      "update_postimage" -> 4L,
      "delete" -> 1L,
      "insert" -> 1L), byType.toString)
    // change rows are LOGICAL — no row-id columns leak into the feed
    assert(!feed.columns.exists(_.startsWith("_row_")))
    // and ids stayed stable through the CDF-enabled DML
    val got = DeltaInterop.readWithRowIds(spark, base)
      .filter(col("id") < 100).collect()
    got.foreach(r =>
      assert(r.getAs[Long]("_row_id") == r.getAs[Long]("id")))
  }

  test("row tracking composes with name-mode column mapping and renames") {
    import spark.implicits._
    val base = tmp()
    DeltaInterop.overwrite(
      spark.range(10).toDF("id").withColumn("v", lit(1L))
        .coalesce(1).sortWithinPartitions("id"), base)
    DeltaInterop.enableColumnMapping(spark, base)
    DeltaInterop.enableRowTracking(spark, base)
    // rename mid-history: physical names diverge from logical — the
    // materialized id columns (physical by construction) must not care
    DeltaInterop.renameColumn(spark, base, "v", "val")
    DeltaDml.updateWhere(spark, base, col("id") < 4,
      Map("val" -> lit(7L)))
    DeltaDml.deleteVectoredWhere(spark, base, col("id") === 6)
    DeltaDml.mergeUpsert(spark, base,
      Seq((2L, 9L), (50L, 9L)).toDF("id", "val"), "id")
    val got = DeltaInterop.readWithRowIds(spark, base).orderBy("id").collect()
    assert(got.length == 10) // 10 - 1 deleted + 1 inserted
    got.filter(_.getAs[Long]("id") < 50).foreach(r =>
      assert(r.getAs[Long]("_row_id") == r.getAs[Long]("id"),
        s"row ${r.getAs[Long]("id")} lost its id on the mapped table"))
    assert(got.filter(_.getAs[Long]("id") == 2L)
      .forall(_.getAs[Long]("val") == 9L))
    val ids = got.map(_.getAs[Long]("_row_id")).toSeq
    assert(ids.distinct.length == ids.length)
  }

  test("row tracking composes with id-mode column mapping") {
    import spark.implicits._
    val base = tmp()
    // id-mode table with DIVERGED physical names — the id-mode point:
    // resolution is by parquet field id, physical names are free. The
    // materialized row-tracking columns carry no mapping id and resolve
    // by their fixed physical names (per-field fallback).
    DeltaInterop.overwriteColumnMapped(
      spark.range(10).toDF("id").withColumn("v", lit(1L))
        .coalesce(1).sortWithinPartitions("id"),
      base, physicalFor = n => s"phys_$n", mode = "id")
    DeltaInterop.enableRowTracking(spark, base)
    DeltaDml.updateWhere(spark, base, col("id") < 4, Map("v" -> lit(7L)))
    DeltaDml.deleteVectoredWhere(spark, base, col("id") === 6)
    DeltaDml.mergeUpsert(spark, base,
      Seq((2L, 9L), (50L, 9L)).toDF("id", "v"), "id")
    // OPTIMIZE materializes ids through an id-mode rewrite (the
    // refusal that fell away): reads by field id, restamps ids into
    // the replacement files
    assert(DeltaInterop.optimize(spark, base,
      smallFileBytes = 1L << 30).nonEmpty)
    val got = DeltaInterop.readWithRowIds(spark, base).orderBy("id").collect()
    assert(got.length == 10) // 10 - 1 deleted + 1 inserted
    got.filter(_.getAs[Long]("id") < 50).foreach(r =>
      assert(r.getAs[Long]("_row_id") == r.getAs[Long]("id"),
        s"row ${r.getAs[Long]("id")} lost its id on the id-mapped table"))
    assert(got.filter(r => r.getAs[Long]("id") < 4 && r.getAs[Long]("id") != 2)
      .forall(_.getAs[Long]("v") == 7L), "update lost on the id-mapped table")
    assert(got.filter(_.getAs[Long]("id") == 2L)
      .forall(_.getAs[Long]("v") == 9L))
    assert(!got.exists(_.getAs[Long]("id") == 6L))
    val ids = got.map(_.getAs[Long]("_row_id")).toSeq
    assert(ids.distinct.length == ids.length)
    // ZORDER also composes: full id-mode rewrite, ids preserved
    assert(DeltaInterop.optimizeZorder(spark, base, Seq("v")).nonEmpty)
    val z = DeltaInterop.readWithRowIds(spark, base)
      .orderBy("id").collect()
    assert(z.map(_.getAs[Long]("_row_id")).toSeq == ids,
      "z-order rewrite moved row ids on the id-mapped table")
  }

  test("REORG purges DVs on an id-mode row-tracked table") {
    import spark.implicits._
    val base = tmp()
    DeltaInterop.overwriteColumnMapped(
      spark.range(8).toDF("id").withColumn("v", lit(1L))
        .coalesce(1).sortWithinPartitions("id"),
      base, physicalFor = n => s"c$n", mode = "id")
    DeltaInterop.enableRowTracking(spark, base)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") < 3)
    assert(DeltaInterop.reorgPurge(spark, base).nonEmpty)
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.files.forall(_.dv.forall(_.cardinality == 0L)),
      "REORG left live deletion vectors")
    val got = DeltaInterop.readWithRowIds(spark, base).orderBy("id").collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == (3L until 8L))
    // survivors keep their original ids through the purge rewrite
    got.foreach(r => assert(r.getAs[Long]("_row_id") == r.getAs[Long]("id")))
  }

  test("enable refuses unsupported combinations and double-enable no-ops") {
    val base = tracked(5)
    val v = DeltaInterop.snapshot(spark, base).version
    assert(DeltaInterop.enableRowTracking(spark, base) == v,
      "enabling twice must not re-commit")
    // a non-tracked table refuses the row-id read loudly
    val plain = tmp()
    DeltaInterop.overwrite(spark.range(3).toDF("id"), plain)
    val e2 = intercept[IllegalArgumentException] {
      DeltaInterop.readWithRowIds(spark, plain)
    }
    assert(e2.getMessage.contains("not enabled"))
  }

  /** Delegate-everything TableIO proxy that runs `inject` once, right
    * before the victim's first _delta_log commit claim — the
    * deterministic race harness DeltaOccSpec/IcebergOccSpec use. */
  private final class RaceInjector(inject: () => Unit)
      extends graft.sources.TableIO {
    private val under = graft.sources.LocalTableIO
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
      if (!injected && d.contains("_delta_log") && d.endsWith(".json")) {
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
    val prior = graft.sources.TableIO.current
    graft.sources.TableIO.current = new RaceInjector(inject)
    try body finally graft.sources.TableIO.current = prior
  }

  test("row-tracked append racing a metadata change refuses (no blind rebase)") {
    // the staged files were conformed against the OLD metaData; a
    // winner that changed schema/column mapping/protocol invalidates
    // them — rebasing blindly would publish e.g. logical-named parquet
    // into a now physically-named table (silent NULLs on read)
    val base = tracked(10)
    val e = intercept[java.util.ConcurrentModificationException] {
      withInjector(() => DeltaInterop.addColumns(spark, base,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("w",
            org.apache.spark.sql.types.LongType))))) {
        DeltaInterop.append(
          spark.range(100, 105).toDF("id").withColumn("v", lit(2L))
            .coalesce(1), base)
      }
    }
    assert(e.getMessage.contains("metadata"))
    // the refused append left no rows; the winner's schema change landed
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.schema.fieldNames.contains("w"))
    assert(DeltaInterop.read(spark, base).count() == 10)
  }

  test("row-tracked append racing a disjoint append rebases with fresh ids") {
    val base = tracked(10)
    withInjector(() => DeltaInterop.append(
      spark.range(200, 205).toDF("id").withColumn("v", lit(2L))
        .coalesce(1), base)) {
      DeltaInterop.append(
        spark.range(100, 105).toDF("id").withColumn("v", lit(3L))
          .coalesce(1), base)
    }
    val got = DeltaInterop.readWithRowIds(spark, base)
    assert(got.count() == 20)
    // the loser re-derived its id range from the winner's new mark:
    // ids stay dense and DISTINCT (a blind rebase would double-allocate)
    val ids = got.select("_row_id").as[Long](org.apache.spark.sql.Encoders
      .scalaLong).collect().sorted.toSeq
    assert(ids == (0L until 20L))
    assert(DeltaInterop.snapshot(spark, base).rowIdHighWaterMark == 19L)
  }
}
