package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.pipeline.{GraftLog, GraftSql}
import graft.sources.{DeltaInterop, IcebergInterop}

/** COPY INTO: exactly-once FILE loading — re-running the statement
  * loads only files the table has not recorded yet (per-file
  * transaction ids in each format's own ledger), new files picked up,
  * loaded files never doubled, schema conformed by NAME. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): File = {
    val d = new File(s"/tmp/graft_test_copyinto_$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()
    d
  }

  private def writeParquetFile(dir: File, fname: String,
                               rows: Seq[(Long, String)]): Unit = {
    val tmp = new File(dir, s".stage_$fname")
    rows.toDF("k", "s").coalesce(1).write.parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, new File(dir, fname).toPath)
    org.apache.commons.io.FileUtils.deleteQuietly(tmp)
  }

  test("COPY INTO loads each file exactly once across re-runs") {
    val srcDir = freshDir("log_src")
    writeParquetFile(srcDir, "a.parquet", Seq((1L, "a"), (2L, "b")))
    writeParquetFile(srcDir, "b.parquet", Seq((3L, "c")))
    val base = freshDir("log_tbl").getPath + "/t"
    GraftLog.overwrite(Seq((0L, "seed")).toDF("k", "s"), base)
    GraftSql.registerTable(spark, "copy_log_t", base)

    val r1 = GraftSql.sql(spark,
      s"COPY INTO copy_log_t FROM '${srcDir.getPath}' FILEFORMAT = PARQUET")
    assert(r1.select("n_files_loaded").head().getLong(0) == 2L)
    assert(spark.table("copy_log_t").count() == 4L)

    // re-run: nothing new → nothing loaded, value unchanged
    val r2 = GraftSql.sql(spark,
      s"COPY INTO copy_log_t FROM '${srcDir.getPath}' FILEFORMAT = PARQUET")
    assert(r2.select("n_files_loaded").head().getLong(0) == 0L)
    assert(spark.table("copy_log_t").count() == 4L)

    // a new file lands → ONLY it loads
    writeParquetFile(srcDir, "c.parquet", Seq((4L, "d"), (5L, "e")))
    val r3 = GraftSql.sql(spark,
      s"COPY INTO copy_log_t FROM '${srcDir.getPath}' FILEFORMAT = PARQUET")
    assert(r3.select("n_files_loaded").head().getLong(0) == 1L)
    assert(spark.table("copy_log_t").as[(Long, String)].collect().map(_._1)
      .sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("COPY INTO a Delta table uses txn actions; CSV conforms by name") {
    val srcDir = freshDir("delta_src")
    // CSV with columns in the OPPOSITE order of the table: name-based
    // conformance must still land values in the right columns
    java.nio.file.Files.writeString(
      new File(srcDir, "x.csv").toPath, "s,k\nhello,7\nworld,8\n")
    val base = freshDir("delta_tbl").getPath + "/t"
    DeltaInterop.overwrite(Seq((1L, "seed")).toDF("k", "s"), base)
    GraftSql.registerDeltaTable(spark, "copy_delta_t", base)
    val r1 = GraftSql.sql(spark,
      s"COPY INTO copy_delta_t FROM '${srcDir.getPath}' FILEFORMAT = CSV")
    assert(r1.select("n_files_loaded").head().getLong(0) == 1L)
    assert(spark.table("copy_delta_t").as[(Long, String)].collect().sorted
      .toSeq == Seq((1L, "seed"), (7L, "hello"), (8L, "world")))
    // idempotent re-run
    val r2 = GraftSql.sql(spark,
      s"COPY INTO copy_delta_t FROM '${srcDir.getPath}' FILEFORMAT = CSV")
    assert(r2.select("n_files_loaded").head().getLong(0) == 0L)
    assert(spark.table("copy_delta_t").count() == 3L)
  }

  test("COPY INTO an Iceberg table gates on snapshot summaries") {
    val srcDir = freshDir("ice_src")
    java.nio.file.Files.writeString(new File(srcDir, "r1.json").toPath,
      """{"k": 10, "s": "x"}
        |{"k": 11, "s": "y"}""".stripMargin)
    val base = freshDir("ice_tbl").getPath + "/t"
    IcebergInterop.overwrite(Seq((1L, "seed")).toDF("k", "s"), base)
    GraftSql.registerIcebergTable(spark, "copy_ice_t", base)
    val r1 = GraftSql.sql(spark,
      s"COPY INTO copy_ice_t FROM '${srcDir.getPath}' FILEFORMAT = JSON")
    assert(r1.select("n_files_loaded").head().getLong(0) == 1L)
    val r2 = GraftSql.sql(spark,
      s"COPY INTO copy_ice_t FROM '${srcDir.getPath}' FILEFORMAT = JSON")
    assert(r2.select("n_files_loaded").head().getLong(0) == 0L)
    assert(spark.table("copy_ice_t").as[(Long, String)].collect().map(_._1)
      .sorted.toSeq == Seq(1L, 10L, 11L))
  }

  test("PATTERN filters files; wrong-schema file refuses before writing") {
    val srcDir = freshDir("pat_src")
    writeParquetFile(srcDir, "load_me.parquet", Seq((1L, "a")))
    writeParquetFile(srcDir, "skip_me.parquet", Seq((2L, "b")))
    val base = freshDir("pat_tbl").getPath + "/t"
    GraftLog.overwrite(Seq((0L, "seed")).toDF("k", "s"), base)
    GraftSql.registerTable(spark, "copy_pat_t", base)
    GraftSql.sql(spark,
      s"COPY INTO copy_pat_t FROM '${srcDir.getPath}' " +
      "FILEFORMAT = PARQUET PATTERN = 'load_*.parquet'")
    assert(spark.table("copy_pat_t").as[(Long, String)].collect().map(_._1)
      .sorted.toSeq == Seq(0L, 1L))
    // schema mismatch: loud refusal, no partial load
    val badDir = freshDir("bad_src")
    Seq((1L, 2L)).toDF("k", "other").coalesce(1)
      .write.parquet(new File(badDir, "stage").getPath)
    val part = new File(badDir, "stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new File(badDir, "bad.parquet").toPath)
    val before = spark.table("copy_pat_t").count()
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"COPY INTO copy_pat_t FROM '${badDir.getPath}/bad.parquet' " +
        "FILEFORMAT = PARQUET")
    }
    assert(e.getMessage.contains("exactly the table columns"))
    assert(spark.table("copy_pat_t").count() == before)
  }
}
