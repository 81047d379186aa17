package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.pipeline.GraftSql
import graft.sources.{DeltaDml, DeltaInterop}

/** REORG TABLE ... APPLY (PURGE): the guaranteed end of the
  * merge-on-read delete lifecycle — DV-carrying files rewrite to their
  * survivors, clean files stay byte-untouched, and a following VACUUM
  * reclaims both the tombstoned data files and the DV bins. */
class DeltaReorgSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"/tmp/graft_test_reorg_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def dvBins(base: String): Seq[File] =
    Option(new File(base).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("deletion_vector_")).toSeq

  test("purge rewrites only DV carriers; value identical; vacuum reclaims") {
    val base = fresh("purge")
    // two files: one will carry a DV, one stays clean
    DeltaInterop.overwrite(
      (0L until 50L).map(k => (k, k)).toDF("k", "v")
        .repartitionByRange(2, col("k")), base)
    val before = DeltaInterop.snapshot(spark, base).files
    assert(before.size == 2)
    DeltaDml.deleteVectoredWhere(spark, base, col("k") < 10) // one file hit
    assert(dvBins(base).nonEmpty)
    val v = DeltaInterop.reorgPurge(spark, base)
    assert(v.isDefined)
    val after = DeltaInterop.snapshot(spark, base).files
    // no live file carries a DV anymore
    assert(after.forall(_.dv.forall(_.cardinality == 0)))
    // the clean file survived BY NAME (never rewritten)
    val cleanBefore = before.filter(_.dv.isEmpty).map(_.path).toSet
    assert(cleanBefore.exists(p => after.exists(_.path == p)))
    assert(DeltaInterop.read(spark, base).select("k").as[Long].collect()
      .sorted.toSeq == (10L until 50L).toSeq)
    // vacuum now reclaims the tombstoned data file AND the DV bin
    DeltaInterop.vacuum(spark, base, retainMillis = 0L)
    assert(dvBins(base).isEmpty)
    assert(DeltaInterop.read(spark, base).count() == 40L)
  }

  test("purge on a DV-free table is a no-op; SQL surface routes it") {
    val base = fresh("sql")
    DeltaInterop.overwrite(
      (0L until 30L).map(k => (k, k % 3)).toDF("k", "g"), base)
    assert(DeltaInterop.reorgPurge(spark, base).isEmpty)
    GraftSql.registerDeltaTable(spark, "reorg_sql_t", base)
    GraftSql.sql(spark, "DELETE FROM reorg_sql_t WHERE g = 1")
    val r = GraftSql.sql(spark, "REORG TABLE reorg_sql_t APPLY (PURGE)")
    assert(r.select("operation").head().getString(0) == "REORG")
    assert(spark.table("reorg_sql_t").count() == 20L)
    assert(DeltaInterop.snapshot(spark, base).files
      .forall(_.dv.forall(_.cardinality == 0)))
    // non-Delta refuses loudly
    val gl = fresh("log")
    graft.pipeline.GraftLog.overwrite(Seq((1L, "a")).toDF("k", "s"), gl)
    GraftSql.registerTable(spark, "reorg_log_t", gl)
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "REORG TABLE reorg_log_t APPLY (PURGE)")
    }
    assert(e.getMessage.contains("Delta"))
  }

  test("purge on a partitioned table keeps partition values") {
    val base = fresh("part")
    DeltaInterop.overwrite(
      (0L until 40L).map(k => (k, (k % 2).toString)).toDF("k", "g"),
      base, partitionBy = Seq("g"))
    DeltaDml.deleteVectoredWhere(spark, base, col("k") < 4)
    DeltaInterop.reorgPurge(spark, base)
    val got = DeltaInterop.read(spark, base)
    assert(got.count() == 36L)
    // partition pruning still works post-purge
    assert(got.filter(col("g") === "0").count() == 18L)
    assert(DeltaInterop.snapshot(spark, base).files
      .forall(_.partitionValues.nonEmpty))
  }
}
