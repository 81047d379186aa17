package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{DeltaInterop, IcebergInterop}

/** RESTORE / rollback edges beyond the q167/q168 oracle checks:
  * vacuumed-file refusal, DV-state restore, post-rollback appends and
  * snapshot-id uniqueness, and history preservation. */
class RestoreRollbackSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("restore_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("delta restore flips data back and keeps both histories") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    DeltaInterop.overwrite(spark.range(100, 103).toDF("id").coalesce(1), base)
    val v = DeltaInterop.restore(spark, base, 0L)
    assert(v == 2L)
    assert(DeltaInterop.read(spark, base).count() == 10)
    assert(DeltaInterop.read(spark, base, versionAsOf = Some(1L)).count() == 3)
    assert(DeltaInterop.read(spark, base, versionAsOf = Some(0L)).count() == 10)
  }

  test("delta restore refuses when target files were vacuumed") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    DeltaInterop.overwrite(spark.range(100, 103).toDF("id").coalesce(1), base)
    DeltaInterop.vacuum(spark, base, retainMillis = 0L)
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.restore(spark, base, 0L)
    }
    assert(e.getMessage.contains("vacuumed"))
    assert(DeltaInterop.read(spark, base).count() == 3)
  }

  test("delta restore reinstates a pre-DV state (rows resurrect)") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(8).toDF("id").coalesce(1), base)
    val file = DeltaInterop.snapshot(spark, base).files.head.path
    DeltaInterop.deleteRowPositions(spark, base, file, Seq(0L, 1L))
    assert(DeltaInterop.read(spark, base).count() == 6)
    DeltaInterop.restore(spark, base, 0L)
    assert(DeltaInterop.read(spark, base).count() == 8)
    // and restoring FORWARD to the DV state re-applies the deletes
    DeltaInterop.restore(spark, base, 1L)
    assert(DeltaInterop.read(spark, base).count() == 6)
  }

  test("delta restore refuses when a restored file's DV bin was vacuumed") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(8).toDF("id").coalesce(1), base)
    val file = DeltaInterop.snapshot(spark, base).files.head.path
    DeltaInterop.deleteRowPositions(spark, base, file, Seq(0L, 1L)) // v1: DV
    DeltaInterop.restore(spark, base, 0L)                          // v2: no DV
    // the data file is live in v2, but v1's DV bin is now unreachable:
    // vacuum removes it (orphan), so restoring to the DV version must
    // refuse — the data parquet alone passes the old check, yet reads
    // of v1 would fail on the missing .bin
    DeltaInterop.vacuum(spark, base, retainMillis = 0L)
    // part-file names contain no chars needing percent-decoding here
    assert(new java.io.File(base, file).exists(),
      "data parquet should survive (it is live)")
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.restore(spark, base, 1L)
    }
    assert(e.getMessage.contains("deletion vectors") ||
      e.getMessage.contains("vacuumed"))
    assert(DeltaInterop.read(spark, base).count() == 8) // table unharmed
  }

  test("delta restore keeps a mapped table's column mapping alive") {
    val base = tmp()
    val df = spark.range(5).select(col("id"), (col("id") + 1).as("v"))
    DeltaInterop.overwriteColumnMapped(df.coalesce(1), base,
      Map("id" -> "col-m", "v" -> "col-n"))
    DeltaInterop.append(
      spark.range(5, 8).select((col("id")).as("col-m"),
        (col("id") + 1).as("col-n")).coalesce(1), base)
    DeltaInterop.restore(spark, base, 0L)
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.columnMappingMode == "name",
      "RESTORE dropped delta.columnMapping.mode")
    val got = DeltaInterop.read(spark, base)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(got.count() == 5)
    assert(got.agg(sum("v")).head().getLong(0) == (1 to 5).sum)
  }

  test("iceberg rollback moves the read path; history survives") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(6).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(6, 9).toDF("id").coalesce(1), base)
    val Seq(s1, s2) = IcebergInterop.snapshotIds(base)
    IcebergInterop.rollbackTo(base, s1)
    assert(IcebergInterop.read(spark, base).count() == 6)
    // rolled-over snapshot still reachable by explicit id
    assert(IcebergInterop.read(spark, base, Some(s2)).count() == 9)
    intercept[IllegalArgumentException] {
      IcebergInterop.rollbackTo(base, 999L)
    }
  }

  test("append after rollback branches cleanly with a fresh snapshot id") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(4).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(4, 6).toDF("id").coalesce(1), base)
    val Seq(s1, s2) = IcebergInterop.snapshotIds(base)
    IcebergInterop.rollbackTo(base, s1)
    IcebergInterop.append(spark.range(100, 102).toDF("id").coalesce(1), base)
    val ids = IcebergInterop.snapshotIds(base)
    assert(ids.distinct.size == ids.size, s"snapshot id collision: $ids")
    val got = IcebergInterop.read(spark, base).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == ((0L to 3L) ++ (100L to 101L)),
      s"rollback branch read wrong rows: ${got.toSeq}")
  }
}
