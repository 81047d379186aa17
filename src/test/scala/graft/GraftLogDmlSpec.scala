package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.pipeline.GraftLog

/** DELETE / change-data-feed / snapshot-diff coverage for graft-log. */
class GraftLogDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_dml_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  test("aligned range delete drops interior files with NO rewrite; others survive byte-untouched") {
    val base = freshBase("aligned")
    // 4 clustered files over k = 0..99: [0,24] [25,49] [50,74] [75,99]
    GraftLog.overwriteClustered(
      (0L until 100L).map(k => (k, s"p$k")).toDF("k", "p"), base,
      Seq("k"), nFiles = 4)
    val before = GraftLog.snapshot(base)
    GraftLog.delete(spark, base, col("k") >= 25 && col("k") <= 74,
      scope = Some(("k", 25L, 74L)))
    val commit = GraftLog.history(spark, base)
      .filter(col("operation") === "delete")
      .select("n_added", "n_removed").as[(Int, Int)].collect().head
    // fully-covered files dropped without staging a single new file
    assert(commit == ((0, 2)))
    val after = GraftLog.snapshot(base)
    // survivors are the SAME file names (no rewrite of untouched files)
    assert(after.files.toSet.subsetOf(before.files.toSet))
    assert(after.files.size == 2)
    assert(GraftLog.read(spark, base).agg(count(lit(1)), min(col("k")),
      max(col("k"))).as[(Long, Long, Long)].collect().head == ((50L, 0L, 99L)))
  }

  test("partial delete rewrites only intersecting files and keeps predicate-NULL rows") {
    val base = freshBase("partial")
    val df = Seq[(Long, java.lang.Long)]((1L, 10L), (2L, null), (3L, 30L),
      (4L, 40L), (5L, null)).toDF("k", "v")
    GraftLog.overwriteClustered(df, base, Seq("k"), nFiles = 1)
    // v > 15 is NULL for k=2,5 → those rows must survive (SQL DELETE)
    GraftLog.delete(spark, base, col("v") > 15)
    assert(GraftLog.read(spark, base).select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 5L))
  }

  test("no-match delete commits nothing and returns the current version") {
    val base = freshBase("nomatch")
    val v1 = GraftLog.overwriteClustered(
      Seq((1L, "a"), (2L, "b")).toDF("k", "p"), base, Seq("k"), nFiles = 1)
    // zone maps prove the scoped range empty → not even a census scan
    assert(GraftLog.delete(spark, base, col("k") > 100,
      scope = Some(("k", 101L, 999L))) == v1)
    // unscoped, census finds zero hits → still no commit
    assert(GraftLog.delete(spark, base, col("k") > 100) == v1)
    assert(GraftLog.currentVersion(base).contains(v1))
  }

  test("delete with txnId is replay-idempotent") {
    val base = freshBase("txn")
    GraftLog.overwriteClustered(
      (0L until 10L).map(k => (k, k * 2)).toDF("k", "v"), base,
      Seq("k"), nFiles = 1)
    val v = GraftLog.delete(spark, base, col("k") < 5, txnId = Some("del-1"))
    // replay: same txnId answers from the log, touches nothing
    assert(GraftLog.delete(spark, base, col("k") < 99,
      txnId = Some("del-1")) == v)
    assert(GraftLog.read(spark, base).count() == 5)
  }

  test("change feed nets to final-minus-initial per key; meta columns carry commit info") {
    val base = freshBase("cdf")
    val v0 = GraftLog.overwriteClustered(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"), base,
      Seq("k"), nFiles = 1)
    GraftLog.upsertScoped(spark, base,
      Seq((2L, 22.0), (4L, 40.0)).toDF("k", "v"), "k")
    GraftLog.delete(spark, base, col("k") === 1)
    val feed = GraftLog.readChangeFeed(spark, base, fromVersion = v0 + 1)
    assert(feed.columns.toSet.contains("_change_type") &&
      feed.columns.toSet.contains("_commit_version") &&
      feed.columns.toSet.contains("_commit_timestamp"))
    val net = feed
      .withColumn("s", when(col("_change_type") === "insert", 1).otherwise(-1))
      .groupBy("k").agg(sum(col("s")).as("net"),
        sum(col("v") * col("s")).as("dv"))
      .filter(col("net") =!= 0 || col("dv") =!= 0.0)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // k=1 deleted (−1, −10); k=2 updated (0, +2); k=3 carried → cancels;
    // k=4 inserted (+1, +40)
    assert(net == Map(1L -> ((-1L, -10.0)), 2L -> ((0L, 2.0)),
      4L -> ((1L, 40.0))))
    // feed bounded to the merge commit only excludes the delete
    val mergeOnly = GraftLog.readChangeFeed(spark, base,
      fromVersion = v0 + 1, toVersion = Some(v0 + 1))
    assert(mergeOnly.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(mergeOnly.select(max(col("_commit_version"))).as[Long]
      .collect().head == v0 + 1)
  }

  test("change feed reads schema-evolved history under the range-end schema") {
    val base = freshBase("cdfevo")
    GraftLog.overwrite(Seq((1L, "a")).toDF("k", "x"), base)
    GraftLog.append(Seq((2L, "b", 9.9)).toDF("k", "x", "score"), base)
    val feed = GraftLog.readChangeFeed(spark, base, fromVersion = 1L)
    // v1's file predates `score`: its rows read the column as null
    assert(feed.filter(col("_commit_version") === 1)
      .select("score").as[Option[Double]].collect().toSeq == Seq(None))
    assert(feed.filter(col("k") === 2).select("score")
      .as[Double].collect().toSeq == Seq(9.9))
  }

  test("empty feed range returns an empty frame with data + meta columns") {
    val base = freshBase("cdfempty")
    GraftLog.overwrite(Seq((1L, "a")).toDF("k", "x"), base)
    val feed = GraftLog.readChangeFeed(spark, base, fromVersion = 99L)
    assert(feed.count() == 0)
    assert(feed.columns.toSeq == Seq("k", "x", "_change_type",
      "_commit_version", "_commit_timestamp"))
  }

  test("purgeDeletes folds deletion vectors into rewrites without changing contents") {
    // the invariant q130 used to re-assert inside its benched path:
    // merge-on-read (DV anti join) and the purged (fully rewritten)
    // table must agree exactly
    val base = freshBase("purge")
    GraftLog.overwriteClustered(
      (0L until 200L).map(k => (k, k % 13, s"p$k")).toDF("k", "g", "p"),
      base, Seq("k"), nFiles = 4)
    GraftLog.deleteVectored(spark, base, col("k") >= 30 && col("k") <= 90,
      scope = Some(("k", 30L, 90L)))
    GraftLog.deleteVectored(spark, base, col("g") === 5)
    def agg() = GraftLog.read(spark, base)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .orderBy(col("g")).as[(Long, Long)].collect().toSeq
    val before = agg()
    GraftLog.purgeDeletes(spark, base) // fold vectors into rewrites
    val after = agg()
    assert(before == after, "purgeDeletes changed the table contents")
    // and the DVs are actually gone: no deletion sidecars remain live
    assert(GraftLog.snapshot(base).dvFiles.isEmpty)
  }

  test("diffSnapshots classifies insert/update/delete exactly and skips carried rows") {
    val base = freshBase("diff")
    val v0 = GraftLog.overwriteClustered(
      Seq[(Long, java.lang.Double)]((1L, 10.0), (2L, 20.0), (3L, null))
        .toDF("k", "v"), base, Seq("k"), nFiles = 1)
    GraftLog.upsertScoped(spark, base,
      // k=2 value change, k=3 null→35 (null-safe compare must flag it),
      // k=5 new; k=1 carried identically through the rewrite
      Seq[(Long, java.lang.Double)]((1L, 10.0), (2L, 22.0), (3L, 35.0),
        (5L, 50.0)).toDF("k", "v"), "k")
    GraftLog.delete(spark, base, col("k") === 1)
    val diff = GraftLog.diffSnapshots(spark, base, Seq("k"), v0)
      .select(col("k"), col("v"), col("_change_type"))
      .as[(Long, Option[Double], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(diff == Map(
      1L -> ((Some(10.0), "delete")), // pre-image values for deletes
      2L -> ((Some(22.0), "update")), // post-image values for updates
      3L -> ((Some(35.0), "update")),
      5L -> ((Some(50.0), "insert"))))
  }
}
