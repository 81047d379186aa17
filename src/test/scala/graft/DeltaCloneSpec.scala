package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.pipeline.GraftSql
import graft.sources.{DeltaDml, DeltaInterop}

/** Shallow clone: a zero-copy Delta table referencing the source's
  * files by absolute path. Independence is the contract — DML on
  * either side never moves the other — and every reader/maintenance
  * path must resolve absolute add paths. */
class DeltaCloneSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"/tmp/graft_test_clone_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def parquetCount(base: String): Int = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq
        .filterNot(_.getName == "_delta_log").flatMap(walk)
      else Seq(f)
    walk(new File(base)).count(_.getName.endsWith(".parquet"))
  }

  test("clone reads the source's data with ZERO copied files") {
    val src = fresh("src"); val dst = fresh("dst")
    DeltaInterop.overwrite(
      (0L until 100L).map(k => (k, k % 7)).toDF("k", "g"), src)
    DeltaInterop.shallowClone(spark, src, dst)
    assert(parquetCount(dst) == 0) // no data under the clone's root
    assert(DeltaInterop.read(spark, dst).count() == 100L)
    assert(DeltaInterop.read(spark, dst).agg(sum("k")).head().getLong(0) ==
      (0L until 100L).sum)
  }

  test("DML on the clone never touches the source, and vice versa") {
    val src = fresh("dml_src"); val dst = fresh("dml_dst")
    DeltaInterop.overwrite(
      (0L until 60L).map(k => (k, k)).toDF("k", "v"), src)
    DeltaInterop.shallowClone(spark, src, dst)
    // clone-side DELETE (deletion vectors land under the CLONE's root)
    DeltaDml.deleteVectoredWhere(spark, dst, col("k") < 20)
    assert(DeltaInterop.read(spark, dst).count() == 40L)
    assert(DeltaInterop.read(spark, src).count() == 60L)
    // source-side DELETE after the clone: clone is pinned
    DeltaDml.deleteVectoredWhere(spark, src, col("k") >= 50)
    assert(DeltaInterop.read(spark, src).count() == 50L)
    assert(DeltaInterop.read(spark, dst).count() == 40L)
    // clone-side append lands under the clone root only
    DeltaInterop.append(Seq((999L, 999L)).toDF("k", "v"), dst)
    assert(parquetCount(dst) >= 1)
    assert(DeltaInterop.read(spark, dst).count() == 41L)
    assert(DeltaInterop.read(spark, src).count() == 50L)
  }

  test("VERSION AS OF clones a historical version") {
    val src = fresh("ver_src"); val dst = fresh("ver_dst")
    DeltaInterop.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src)
    val v0 = DeltaInterop.snapshot(spark, src).version
    DeltaInterop.overwrite(Seq((9L, "z")).toDF("k", "s"), src)
    DeltaInterop.shallowClone(spark, src, dst, Some(v0))
    assert(DeltaInterop.read(spark, dst).as[(Long, String)]
      .collect().sorted.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("a DV-bearing source clones with its deletion vectors honored") {
    val src = fresh("dv_src"); val dst = fresh("dv_dst")
    DeltaInterop.overwrite(
      (0L until 30L).map(k => (k, k)).toDF("k", "v"), src)
    DeltaDml.deleteVectoredWhere(spark, src, col("k") % 3 === 0)
    DeltaInterop.shallowClone(spark, src, dst)
    assert(DeltaInterop.read(spark, dst).count() == 20L)
    assert(DeltaInterop.read(spark, dst).select("k").as[Long].collect()
      .forall(_ % 3 != 0))
    // the clone's own stats/maintenance work over absolute paths
    assert(DeltaInterop.history(spark, dst).count() == 1L)
  }

  test("the clone's vacuum never deletes the source's files") {
    val src = fresh("vac_src"); val dst = fresh("vac_dst")
    DeltaInterop.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src)
    DeltaInterop.shallowClone(spark, src, dst)
    // replace the clone's contents so the referenced files tombstone
    DeltaInterop.overwrite(Seq((3L, "c")).toDF("k", "s"), dst)
    DeltaInterop.vacuum(spark, dst, retainMillis = 0L)
    // source still fully readable — its files were outside the clone root
    assert(DeltaInterop.read(spark, src).count() == 2L)
    assert(DeltaInterop.read(spark, dst).count() == 1L)
  }

  test("SQL: CREATE TABLE ... SHALLOW CLONE registers a DML-able table") {
    val src = fresh("sql_src"); val dst = fresh("sql_dst")
    DeltaInterop.overwrite(
      (0L until 40L).map(k => (k, k % 4)).toDF("k", "g"), src)
    GraftSql.registerDeltaTable(spark, "clone_sql_src", src)
    val r = GraftSql.sql(spark,
      s"CREATE TABLE clone_sql_dst SHALLOW CLONE clone_sql_src LOCATION '$dst'")
    assert(r.select("operation").head().getString(0) == "SHALLOW CLONE")
    assert(spark.table("clone_sql_dst").count() == 40L)
    GraftSql.sql(spark, "DELETE FROM clone_sql_dst WHERE g = 0")
    assert(spark.table("clone_sql_dst").count() == 30L)
    assert(spark.table("clone_sql_src").count() == 40L)
    // non-Delta source refuses
    val gl = fresh("sql_log")
    graft.pipeline.GraftLog.overwrite(Seq((1L, "a")).toDF("k", "s"), gl)
    GraftSql.registerTable(spark, "clone_sql_log", gl)
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CREATE TABLE c2 SHALLOW CLONE clone_sql_log LOCATION '${fresh("x")}'")
    }
    assert(e.getMessage.contains("Delta"))
  }

  test("deep clone is independent of the SOURCE's vacuum") {
    val src = fresh("deep_src"); val dst = fresh("deep_dst")
    DeltaInterop.overwrite(
      (0L until 40L).map(k => (k, (k % 2).toString)).toDF("k", "g"),
      src, partitionBy = Seq("g"))
    DeltaDml.deleteVectoredWhere(spark, src, col("k") < 5)
    DeltaInterop.deepClone(spark, src, dst)
    assert(DeltaInterop.read(spark, dst).count() == 35L)
    // source replaces its contents and vacuums everything old away —
    // the shallow-clone hazard; a deep clone must not care
    DeltaInterop.overwrite(Seq((99L, "x")).toDF("k", "g"), src)
    DeltaInterop.vacuum(spark, src, retainMillis = 0L)
    assert(DeltaInterop.read(spark, dst).count() == 35L)
    assert(DeltaInterop.read(spark, dst).filter(col("g") === "1")
      .count() > 0) // partition layout survived the link copy
    // and the clone stays DML-able on its own
    DeltaDml.deleteVectoredWhere(spark, dst, col("k") >= 30)
    assert(DeltaInterop.read(spark, dst).count() == 25L)
  }

  test("SQL CLONE without SHALLOW is the deep clone") {
    val src = fresh("deepsql_src"); val dst = fresh("deepsql_dst")
    DeltaInterop.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src)
    GraftSql.registerDeltaTable(spark, "deep_sql_src", src)
    val r = GraftSql.sql(spark,
      s"CREATE TABLE deep_sql_dst CLONE deep_sql_src LOCATION '$dst'")
    assert(r.select("operation").head().getString(0) == "CLONE")
    // files live under the clone's own root (hard links, not references)
    assert(parquetCount(dst) >= 1)
    assert(spark.table("deep_sql_dst").count() == 2L)
  }

  test("cloning a column-mapped source keeps the mapping readable") {
    val src = fresh("map_src"); val dst = fresh("map_dst")
    DeltaInterop.overwriteColumnMapped(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src,
      physicalFor = n => s"phys_$n")
    DeltaInterop.shallowClone(spark, src, dst)
    val got = DeltaInterop.read(spark, dst)
    assert(got.columns.toSeq == Seq("k", "s")) // logical names resolve
    assert(got.as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }
}
