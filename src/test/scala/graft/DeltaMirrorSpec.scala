package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.pipeline.GraftSql
import graft.sources.{DeltaDml, DeltaInterop, DeltaMirror, IcebergInterop}

/** Delta mirror of an Iceberg-primary table (UniForm reversed, the
  * Apache XTable shape): `_delta_log/` beside `metadata/` under one
  * base, same data files. Every Iceberg commit must become readable
  * through the Delta reader after a sync; the Delta side is read-only;
  * appends sync incrementally. */
class DeltaMirrorSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_dmirror_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(df.columns.map(col).toSeq: _*).collect().toSeq

  private def commitLines(base: String, v: Long): Seq[String] =
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      base, "_delta_log", f"$v%020d.json")).toArray.toSeq
      .map(_.toString).filter(_.nonEmpty)

  test("enable publishes a readable mirror; partitioned values exact") {
    val base = freshBase("enable")
    val df = (0L until 120L).map(k => (k, (k % 3).toInt, s"r$k"))
      .toDF("id", "p", "tag")
    IcebergInterop.overwrite(df.repartition(2), base,
      partitionBy = Seq("p"))
    DeltaMirror.enable(spark, base)
    assert(DeltaMirror.isMirror(base))
    assert(sortedRows(DeltaInterop.read(spark, base)
             .select("id", "p", "tag")) ==
           sortedRows(IcebergInterop.read(spark, base)
             .select("id", "p", "tag")))
    // enable is idempotent (sync finds itself current)
    val v = DeltaInterop.snapshot(spark, base).version
    DeltaMirror.enable(spark, base)
    assert(DeltaInterop.snapshot(spark, base).version == v)
  }

  test("an Iceberg append syncs as adds only — O(new files) metadata") {
    val base = freshBase("append")
    IcebergInterop.overwrite((0L until 100L).toDF("id").coalesce(1), base)
    DeltaMirror.enable(spark, base)
    IcebergInterop.append((100L until 150L).toDF("id").coalesce(1), base)
    val v = DeltaMirror.sync(spark, base)
    val lines = commitLines(base, v)
    assert(lines.count(_.contains("\"add\"")) == 1)
    assert(!lines.exists(_.contains("\"remove\"")))
    assert(DeltaInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 150L).sum)
  }

  test("Iceberg position deletes become mirror deletion vectors") {
    val base = freshBase("dv")
    IcebergInterop.overwrite((0L until 100L).toDF("id").coalesce(1), base)
    IcebergInterop.append((100L until 200L).toDF("id").coalesce(1), base)
    DeltaMirror.enable(spark, base)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") % 10 === 3)
    DeltaMirror.sync(spark, base)
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.files.exists(_.dv.exists(_.cardinality > 0)))
    assert(snap.protocolFeatures.contains("deletionVectors"))
    assert(DeltaInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 200L).filterNot(_ % 10 == 3).sum)
  }

  test("unchanged files carry verbatim across a delete sync") {
    val base = freshBase("carry")
    IcebergInterop.overwrite((0L until 50L).toDF("id").coalesce(1), base)
    IcebergInterop.append((100L until 150L).toDF("id").coalesce(1), base)
    DeltaMirror.enable(spark, base)
    val before = DeltaInterop.snapshot(spark, base).files
      .map(f => f.path -> f.dv).toMap
    // delete touches only the SECOND file's rows
    IcebergInterop.deletePositionsWhere(spark, base, col("id") === 110L)
    val v = DeltaMirror.sync(spark, base)
    val after = DeltaInterop.snapshot(spark, base).files
    // the untouched file's add (path AND dv descriptor) is identical
    val untouched = after.filter(f => before.get(f.path).contains(f.dv))
    assert(untouched.size == after.size - 1,
      s"expected exactly one changed file, got ${after.size - untouched.size}")
    // and the sync commit re-added only the touched file
    val lines = commitLines(base, v)
    assert(lines.count(_.contains("\"add\"")) == 1)
    assert(lines.count(_.contains("\"remove\"")) == 1)
  }

  test("compaction on the Iceberg side republishes the live set") {
    val base = freshBase("compact")
    IcebergInterop.overwrite((0L until 40L).toDF("id").coalesce(1), base)
    IcebergInterop.append((40L until 80L).toDF("id").coalesce(1), base)
    DeltaMirror.enable(spark, base)
    IcebergInterop.rewriteDataFiles(spark, base)
    DeltaMirror.sync(spark, base)
    assert(DeltaInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 80L).sum)
  }

  test("the Delta side of a mirror is read-only") {
    val base = freshBase("readonly")
    IcebergInterop.overwrite((0L until 10L).toDF("id"), base)
    DeltaMirror.enable(spark, base)
    val e1 = intercept[IllegalStateException](
      DeltaInterop.append((10L until 20L).toDF("id"), base))
    assert(e1.getMessage.contains("read-only"))
    val e2 = intercept[IllegalStateException](
      DeltaDml.deleteVectoredWhere(spark, base, col("id") === 1L))
    assert(e2.getMessage.contains("read-only"))
    val e3 = intercept[IllegalArgumentException](
      DeltaInterop.vacuum(spark, base, retainMillis = 0L))
    assert(e3.getMessage.contains("MIRROR"))
  }

  test("expireSnapshots pre-syncs a lagging mirror before deleting files") {
    val base = freshBase("expire")
    IcebergInterop.overwrite((0L until 30L).toDF("id").coalesce(1), base)
    DeltaMirror.enable(spark, base)
    // the Iceberg side compacts TWICE; the mirror still references the
    // ORIGINAL file, which expiry would otherwise delete
    IcebergInterop.append((30L until 60L).toDF("id").coalesce(1), base)
    IcebergInterop.rewriteDataFiles(spark, base)
    IcebergInterop.expireSnapshots(spark, base, retainLast = 1)
    assert(DeltaInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 60L).sum)
  }

  test("Iceberg ADD COLUMN mirrors; old rows read NULL") {
    val base = freshBase("evolve")
    IcebergInterop.overwrite((0L until 20L).toDF("id").coalesce(1), base)
    DeltaMirror.enable(spark, base)
    IcebergInterop.addColumn(base, "bonus", org.apache.spark.sql.types.LongType)
    IcebergInterop.append((20L until 30L).map(k => (k, k * 3))
      .toDF("id", "bonus").coalesce(1), base)
    DeltaMirror.sync(spark, base)
    val got = DeltaInterop.read(spark, base)
    assert(got.columns.toSeq == Seq("id", "bonus"))
    assert(got.filter(col("id") < 20 && col("bonus").isNotNull).count() == 0)
    assert(got.filter(col("id") >= 20).agg(sum("bonus")).head().getLong(0)
      == (20L until 30L).map(_ * 3).sum)
  }

  test("Iceberg RENAME mirrors via id-mapping; DROP retires the column") {
    val base = freshBase("rename")
    IcebergInterop.overwrite((0L until 40L).map(k => (k, k * 2, s"t$k"))
      .toDF("id", "v", "tag").coalesce(1), base)
    DeltaMirror.enable(spark, base)
    // rename keeps the Iceberg field id; the mirror upgrades to
    // columnMapping mode `id` — delta.columnMapping.id = the field id
    // the data files already carry
    IcebergInterop.renameColumn(base, "v", "score")
    DeltaMirror.sync(spark, base)
    val snap1 = DeltaInterop.snapshot(spark, base)
    assert(snap1.columnMappingMode == "id")
    assert(snap1.schema.fieldNames.toSeq == Seq("id", "score", "tag"))
    // OLD files (written pre-rename) resolve by field id, value-exact
    assert(DeltaInterop.read(spark, base).agg(sum("score")).head().getLong(0)
      == (0L until 40L).map(_ * 2).sum)
    // appends under the new name land and read back
    IcebergInterop.append((40L until 50L).map(k => (k, k * 2, s"t$k"))
      .toDF("id", "score", "tag").coalesce(1), base)
    DeltaMirror.sync(spark, base)
    assert(DeltaInterop.read(spark, base).agg(sum("score")).head().getLong(0)
      == (0L until 50L).map(_ * 2).sum)
    // DROP retires the column from the mirror schema
    IcebergInterop.dropColumn(spark, base, "tag")
    DeltaMirror.sync(spark, base)
    val snap2 = DeltaInterop.snapshot(spark, base)
    assert(snap2.schema.fieldNames.toSeq == Seq("id", "score"))
    assert(DeltaInterop.read(spark, base).columns.toSeq ==
      Seq("id", "score"))
  }

  test("Iceberg type promotion mirrors as a widened read") {
    val base = freshBase("promote")
    val df0 = (0 until 30).map(k => (k.toLong, k * 10)).toDF("id", "n")
    IcebergInterop.overwrite(df0.coalesce(1), base)
    DeltaMirror.enable(spark, base)
    IcebergInterop.promoteColumnType(base, "n",
      org.apache.spark.sql.types.LongType)
    IcebergInterop.append((30L until 40L).map(k => (k, k * 10L))
      .toDF("id", "n").coalesce(1), base)
    DeltaMirror.sync(spark, base)
    val got = DeltaInterop.read(spark, base)
    assert(got.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.agg(sum("n")).head().getLong(0) ==
      (0L until 40L).map(_ * 10).sum)
  }

  test("statement-layer auto-sync: Iceberg SQL DML maintains the mirror") {
    val base = freshBase("sqlhook")
    val df0 = (0L until 50L).map(k => (k, k * 2)).toDF("id", "v")
    // nullable creation schema: INSERT ... SELECT expressions are
    // nullable, and the Iceberg append gate refuses nullable-into-
    // required
    IcebergInterop.overwrite(spark.createDataFrame(df0.rdd,
      org.apache.spark.sql.types.StructType(
        df0.schema.fields.map(_.copy(nullable = true)))).coalesce(1), base)
    DeltaMirror.enable(spark, base)
    GraftSql.registerIcebergTable(spark, "dmirror_sql_t", base)
    GraftSql.sql(spark,
      "INSERT INTO dmirror_sql_t SELECT id + 1000 AS id, v " +
      "FROM dmirror_sql_t WHERE id < 5")
    GraftSql.sql(spark, "DELETE FROM dmirror_sql_t WHERE id % 10 = 2")
    // no explicit sync anywhere — the drain maintained the mirror
    assert(sortedRows(DeltaInterop.read(spark, base)) ==
           sortedRows(IcebergInterop.read(spark, base)))
  }

  test("the streaming Iceberg sink maintains the Delta mirror per batch") {
    val base = freshBase("streamsink")
    val df0 = (0L until 10L).toDF("id")
    // nullable creation schema: streamed batches arrive nullable, and
    // the Iceberg append gate refuses nullable-into-required
    IcebergInterop.overwrite(spark.createDataFrame(df0.rdd,
      org.apache.spark.sql.types.StructType(
        df0.schema.fields.map(_.copy(nullable = true)))).coalesce(1), base)
    DeltaMirror.enable(spark, base)
    val srcDir = freshBase("streamsink_src")
    spark.range(100, 140).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    graft.streaming.EventStreams.streamIngestIceberg(
      spark.readStream.schema("id LONG").parquet(srcDir), base)
    // NO manual DeltaMirror.sync anywhere — the sink's per-batch tick
    // kept the mirror current
    assert(sortedRows(DeltaInterop.read(spark, base).select("id")) ==
           sortedRows(IcebergInterop.read(spark, base).select("id")))
    assert(DeltaInterop.read(spark, base).count() == 50L)
  }

  test("a failed initial convert leaves no mirror marker behind") {
    val base = freshBase("failconv")
    IcebergInterop.overwrite(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s").coalesce(1), base)
    IcebergInterop.addEqualityDeletes(spark, base,
      Seq((2L, "b")).toDF("k", "s"), Seq("k"))
    // live equality deletes have no Delta encoding — enable refuses,
    // and the refusal must NOT leave the read-only marker beside an
    // empty log (that would poison Delta writes and Iceberg
    // maintenance forever)
    val e = intercept[IllegalArgumentException](DeltaMirror.enable(spark, base))
    assert(e.getMessage.contains("equality deletes"))
    assert(!DeltaMirror.isMirror(base))
    // the refusal isn't sticky: positionalize and retry succeeds
    IcebergInterop.positionalizeEqualityDeletes(spark, base)
    DeltaMirror.enable(spark, base)
    assert(DeltaMirror.isMirror(base))
    assert(sortedRows(DeltaInterop.read(spark, base)) ==
           sortedRows(IcebergInterop.read(spark, base)))
    assert(DeltaInterop.read(spark, base).count() == 2L)
  }

  test("mirror maxColumnId never decreases when the highest-id column drops") {
    val base = freshBase("maxcol")
    IcebergInterop.overwrite((0L until 20L).map(k => (k, k * 2, s"t$k"))
      .toDF("id", "v", "tag").coalesce(1), base)
    DeltaMirror.enable(spark, base)
    IcebergInterop.renameColumn(base, "v", "score") // forces id-mapping
    DeltaMirror.sync(spark, base)
    val m1 = DeltaInterop.snapshot(spark, base)
      .configuration("delta.columnMapping.maxColumnId").toLong
    assert(m1 == 3L) // fields id/score/tag = ids 1/2/3
    // dropping the HIGHEST-id column must not regress maxColumnId —
    // Delta spec invariant external readers validate
    IcebergInterop.dropColumn(spark, base, "tag")
    DeltaMirror.sync(spark, base)
    val m2 = DeltaInterop.snapshot(spark, base)
      .configuration("delta.columnMapping.maxColumnId").toLong
    assert(m2 == m1)
    assert(DeltaInterop.read(spark, base).columns.toSeq == Seq("id", "score"))
  }

  test("a foreign Delta log at the base refuses the mirror sync") {
    val base = freshBase("foreign")
    IcebergInterop.overwrite((0L until 10L).toDF("id"), base)
    // a REAL (non-mirror) Delta log already lives there
    DeltaInterop.overwrite((0L until 5L).toDF("id"), base + "_other")
    org.apache.commons.io.FileUtils.copyDirectory(
      new File(base + "_other", "_delta_log"),
      new File(base, "_delta_log"))
    val e = intercept[IllegalStateException](DeltaMirror.sync(spark, base))
    assert(e.getMessage.contains("NOT managed"))
  }
}
