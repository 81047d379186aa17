package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Federation

/** Federated multi-format union: disjoint slices written through four
  * different table formats must read back as exactly the original rows,
  * missing columns null-fill by name, and the plan must be a Union of
  * independent scans (no shuffle/exchange introduced by the federation
  * itself). */
class FederationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = {
    val d = Files.createTempDirectory("fed").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("union over parquet + delta + iceberg + graft-log reproduces the table") {
    val base = tmp()
    val df = (1L to 400L).map(i => (i, s"k${i % 7}", i * 1.5)).toDF("id", "k", "v")
    df.filter(col("id") % 4 === 0).write.parquet(s"$base/pq")
    graft.sources.DeltaInterop.overwrite(df.filter(col("id") % 4 === 1), s"$base/delta")
    graft.sources.IcebergInterop.overwrite(df.filter(col("id") % 4 === 2), s"$base/iceberg")
    graft.pipeline.GraftLog.overwrite(df.filter(col("id") % 4 === 3), s"$base/graftlog")
    val fed = Federation.unionAll(spark, Seq(
      Federation.Parquet(s"$base/pq"), Federation.Delta(s"$base/delta"),
      Federation.Iceberg(s"$base/iceberg"), Federation.GraftLogTable(s"$base/graftlog")))
    val got = fed.select("id", "k", "v").collect().map(_.toString).sorted.toSeq
    val want = df.collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("missing columns null-fill by name; source tag identifies the member") {
    val base = tmp()
    val a = Seq((1L, "x", 10.0)).toDF("id", "k", "v")
    val b = Seq((2L, "y")).toDF("id", "k") // no v column
    a.write.parquet(s"$base/pq")
    graft.pipeline.GraftLog.overwrite(b, s"$base/graftlog")
    val fed = Federation.unionAll(spark, Seq(
      Federation.Parquet(s"$base/pq"),
      Federation.GraftLogTable(s"$base/graftlog")), sourceTag = Some("src"))
    val rows = fed.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("src") == "parquet" && rows(0).getAs[Double]("v") == 10.0)
    assert(rows(1).getAs[String]("src") == "graftlogtable" && rows(1).isNullAt(rows(1).fieldIndex("v")))
  }

  test("format-level time travel works inside the federation") {
    val base = tmp()
    val v0 = Seq((1L, 1.0)).toDF("id", "v")
    graft.sources.DeltaInterop.overwrite(v0, s"$base/delta")
    graft.sources.DeltaInterop.append(Seq((2L, 2.0)).toDF("id", "v"), s"$base/delta")
    val latest = Federation.unionAll(spark, Seq(Federation.Delta(s"$base/delta")))
    val pinned = Federation.unionAll(spark, Seq(Federation.Delta(s"$base/delta", versionAsOf = Some(0L))))
    assert(latest.count() == 2 && pinned.count() == 1)
  }

  test("diff: a faithful migration diffs empty; divergences classify") {
    val base = tmp()
    val src = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    graft.sources.DeltaInterop.overwrite(src.coalesce(1), s"$base/delta")
    graft.sources.IcebergInterop.overwrite(src.coalesce(1), s"$base/ice")
    assert(Federation.diff(spark, Federation.Delta(s"$base/delta"),
      Federation.Iceberg(s"$base/ice"), Seq("id")).count() == 0)

    // perturbed: drop id=1, change id=2, add id=9
    val bad = Seq((2L, 21.0), (3L, 30.0), (9L, 90.0)).toDF("id", "v")
    graft.sources.IcebergInterop.overwrite(bad.coalesce(1), s"$base/ice2")
    val got = Federation.diff(spark, Federation.Delta(s"$base/delta"),
        Federation.Iceberg(s"$base/ice2"), Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "only_left"), (2L, "changed"), (9L, "only_right")))
  }

  test("convert round-trips through every format pair losslessly") {
    val base = tmp()
    val src = spark.range(50).select(col("id"), (col("id") % 7).as("k"))
      .coalesce(1)
    graft.sources.DeltaInterop.overwrite(src, s"$base/d0")
    val d0 = Federation.Delta(s"$base/d0")
    val ice = Federation.convert(spark, d0, Federation.Iceberg(s"$base/i1"))
    val gl = Federation.convert(spark, ice, Federation.GraftLogTable(s"$base/g2"))
    val pq = Federation.convert(spark, gl, Federation.Parquet(s"$base/p3"))
    assert(Federation.diff(spark, d0, pq, Seq("id")).isEmpty)
    assert(Federation.readMember(spark, pq).count() == 50)
  }

  test("plan: the federation is a Union of scans with no added exchange") {
    val base = tmp()
    val df = (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v")
    df.filter(col("id") <= 25).write.parquet(s"$base/pq")
    graft.pipeline.GraftLog.overwrite(df.filter(col("id") > 25), s"$base/graftlog")
    val fed = Federation.unionAll(spark, Seq(
      Federation.Parquet(s"$base/pq"), Federation.GraftLogTable(s"$base/graftlog")))
    val plan = fed.queryExecution.executedPlan.toString
    assert(plan.contains("Union"))
    assert(!plan.contains("Exchange"), s"federation added a shuffle:\n$plan")
  }
}
