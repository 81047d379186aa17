package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.DeltaInterop

/** `delta.autoOptimize.autoCompact`: once a partition crosses
  * minNumFiles small files, the NEXT append triggers one best-effort
  * OPTIMIZE commit; tables that don't opt in never compact (and pay
  * zero log I/O for the check). Pairs with optimizeWrite: the write
  * stops the fan-out, auto-compact mops up many-small-commits
  * accretion (the streaming-sink shape). */
class DeltaAutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_autoc_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def withMinFiles[A](n: Int)(f: => A): A = {
    spark.conf.set("spark.databricks.delta.autoCompact.minNumFiles", n)
    try f
    finally spark.conf.unset("spark.databricks.delta.autoCompact.minNumFiles")
  }

  test("crossing minNumFiles triggers one OPTIMIZE; values exact") {
    val base = freshBase("on")
    withMinFiles(5) {
      DeltaInterop.overwrite(Seq((0L, "x")).toDF("id", "s").coalesce(1),
        base, configuration =
          Map("delta.autoOptimize.autoCompact" -> "true"))
      (1L to 3L).foreach(k => DeltaInterop.append(
        Seq((k, s"v$k")).toDF("id", "s").coalesce(1), base))
      assert(DeltaInterop.snapshot(spark, base).files.size == 4)
      DeltaInterop.append(Seq((4L, "v4")).toDF("id", "s").coalesce(1), base)
      val snap = DeltaInterop.snapshot(spark, base)
      assert(snap.files.size == 1, s"not compacted: ${snap.files.map(_.path)}")
      val ops = DeltaInterop.history(spark, base)
        .select("operation").as[String].collect()
      assert(ops.count(_ == "OPTIMIZE") == 1, ops.toSeq)
      assert(DeltaInterop.read(spark, base).orderBy("id")
        .as[(Long, String)].collect().toSeq ==
        (0L to 4L).map(k => (k, if (k == 0) "x" else s"v$k")))
    }
  }

  test("without the property, appends accumulate and nothing compacts") {
    val base = freshBase("off")
    withMinFiles(2) {
      DeltaInterop.overwrite(Seq((0L, "x")).toDF("id", "s").coalesce(1), base)
      (1L to 4L).foreach(k => DeltaInterop.append(
        Seq((k, s"v$k")).toDF("id", "s").coalesce(1), base))
      assert(DeltaInterop.snapshot(spark, base).files.size == 5)
      assert(!DeltaInterop.history(spark, base)
        .select("operation").as[String].collect().contains("OPTIMIZE"))
    }
  }

  test("streaming-shaped idempotent appends trigger it too") {
    val base = freshBase("stream")
    withMinFiles(4) {
      DeltaInterop.overwrite(Seq((0L, 0L)).toDF("k", "v").coalesce(1),
        base, configuration =
          Map("delta.autoOptimize.autoCompact" -> "true"))
      (1L to 3L).foreach(b => DeltaInterop.appendIdempotent(
        Seq((b, b)).toDF("k", "v").coalesce(1), base, "app-1", b))
      val snap = DeltaInterop.snapshot(spark, base)
      assert(snap.files.size == 1, snap.files.map(_.path))
      assert(DeltaInterop.read(spark, base).count() == 4L)
      // replayed batch: still skipped BEFORE any staging or compaction
      assert(!DeltaInterop.appendIdempotent(
        Seq((9L, 9L)).toDF("k", "v").coalesce(1), base, "app-1", 2L))
    }
  }
}
