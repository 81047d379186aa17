package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.pipeline.{GraftLog, IncrementalView}

/** Change-feed-driven materialized view maintenance. */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): (String, String) = {
    val b = s"/tmp/graft_test_ivm_${name}_base"
    val v = s"/tmp/graft_test_ivm_${name}_view"
    Seq(b, v).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new File(p)))
    (b, v)
  }

  private def refresh(base: String, view: String): Long =
    IncrementalView.refreshAggregate(spark, base, view, Seq("g"), Seq("v"))

  private def state(view: String): Map[Long, (Long, Double)] =
    GraftLog.read(spark, view)
      .select(col("g"), col("n_rows"), col("sum_v").cast("double"))
      .as[(Long, Long, Double)].collect()
      .map { case (g, n, s) => g -> (n, s) }.toMap

  test("incremental fold over append+merge+delete equals recompute") {
    val (base, view) = fresh("fold")
    GraftLog.overwriteClustered(
      (0L until 200L).map(k => (k, k % 5, k.toDouble)).toDF("k", "g", "v"),
      base, Seq("k"), nFiles = 4)
    refresh(base, view) // full build
    GraftLog.append((200L until 240L).map(k => (k, k % 5, k.toDouble))
      .toDF("k", "g", "v"), base)
    GraftLog.upsertScoped(spark, base,
      (0L until 50L).map(k => (k, k % 5, k.toDouble + 1000)).toDF("k", "g", "v"),
      "k")
    GraftLog.delete(spark, base, col("k") >= 100 && col("k") < 150,
      scope = Some(("k", 100L, 149L)))
    val applied = refresh(base, view) // three commits folded in one refresh
    assert(applied == GraftLog.currentVersion(base).get)
    val expected = GraftLog.read(spark, base)
      .groupBy(col("g")).agg(count(lit(1)), sum(col("v")))
      .as[(Long, Long, Double)].collect()
      .map { case (g, n, s) => g -> (n, s) }.toMap
    assert(state(view) == expected)
  }

  test("refresh with no new base commits is a no-op (no view commit)") {
    val (base, view) = fresh("noop")
    GraftLog.overwrite(Seq((1L, 1L, 2.0), (2L, 1L, 3.0)).toDF("k", "g", "v"),
      base)
    refresh(base, view)
    val viewHead = GraftLog.currentVersion(view).get
    refresh(base, view)
    refresh(base, view)
    assert(GraftLog.currentVersion(view).get == viewHead)
  }

  test("a refresh reads only the feed, never the pre-refresh base files") {
    val (base, view) = fresh("feedonly")
    GraftLog.overwrite(
      (0L until 100L).map(k => (k, k % 3, 1.0)).toDF("k", "g", "v"), base)
    refresh(base, view) // full build scans v1's files — the last time ever
    // Make the v1 data files unreadable: an incremental refresh that
    // touched ANY pre-feed file would now fail. (The files stay in the
    // snapshot, so a plain read() of the base WOULD fail — the point.)
    val v1Files = GraftLog.snapshot(base).files
    v1Files.foreach { f =>
      val from = new File(base, f)
      assert(from.renameTo(new File(base, f + ".hidden")))
    }
    GraftLog.append(Seq((100L, 0L, 7.0), (101L, 1L, 9.0)).toDF("k", "g", "v"),
      base)
    refresh(base, view) // must plan from the append's files only
    val s = state(view)
    assert(s(0L) == ((35L, 41.0)) && s(1L) == ((34L, 42.0)))
    // restore so later listings of /tmp stay sane
    v1Files.foreach { f =>
      new File(base, f + ".hidden").renameTo(new File(base, f))
    }
  }

  test("groups folded to zero rows disappear; null key is one group") {
    val (base, view) = fresh("zero")
    val df = Seq[(Long, java.lang.Long, Double)](
      (1L, 7L, 1.0), (2L, 7L, 2.0), (3L, null, 5.0), (4L, null, 6.0))
      .toDF("k", "g", "v")
    GraftLog.overwrite(df, base)
    refresh(base, view)
    assert(GraftLog.read(spark, view).count() == 2) // 7 and null
    GraftLog.delete(spark, base, col("g") === 7L) // SQL NULL keeps null rows
    refresh(base, view)
    val rows = GraftLog.read(spark, view)
      .select(col("g"), col("n_rows"), col("sum_v").cast("double"))
      .as[(Option[Long], Long, Double)].collect().toSeq
    assert(rows == Seq((None, 2L, 11.0))) // group 7 vanished, null survived
  }

  test("replayed refresh of the same base version is txn-idempotent") {
    val (base, view) = fresh("replay")
    GraftLog.overwrite(Seq((1L, 1L, 2.0)).toDF("k", "g", "v"), base)
    refresh(base, view)
    GraftLog.append(Seq((2L, 1L, 3.0)).toDF("k", "g", "v"), base)
    refresh(base, view)
    val commits = GraftLog.history(spark, base).count()
    val viewHead = GraftLog.currentVersion(view).get
    // same base head again → txnId ivm@2 already in the view log → no-op
    refresh(base, view)
    assert(GraftLog.currentVersion(view).get == viewHead)
    assert(GraftLog.history(spark, base).count() == commits)
    assert(state(view) == Map(1L -> ((2L, 5.0))))
  }
}
