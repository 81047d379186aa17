package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop
import graft.streaming.{EventStreams, IcebergStream}

/** Iceberg streaming tail: snapshot-diff hard-link mirror + file
  * stream; append-only contract with fail/ignore/reemit on rewrites. */
class IcebergStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_istream_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  test("tail streams the initial load plus appends, exactly once") {
    val base = freshBase("tail")
    val feed = freshBase("tail_feed")
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(100, 105).toDF("id").coalesce(1), base)
    val agg = IcebergStream.tail(spark, base, feed)
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
    val got = EventStreams.drainAvailableNow(agg).as[(Long, Long)].head()
    assert(got == ((15L, (0L until 10L).sum + (100L until 105L).sum)))
    // incremental: a new append surfaces after a re-sync, not before
    IcebergInterop.append(spark.range(200, 202).toDF("id").coalesce(1), base)
    assert(IcebergStream.syncFeed(spark, base, feed) ==
      IcebergInterop.snapshotIds(base).last)
    val again = EventStreams.drainAvailableNow(
      IcebergStream.tail(spark, base, feed)
        .agg(count(lit(1)).as("n"))).as[Long].head()
    assert(again == 17L)
  }

  test("non-append snapshots fail by default; ignore skips them") {
    val base = freshBase("rw")
    val feed = freshBase("rw_feed")
    IcebergInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base)
    IcebergStream.syncFeed(spark, base, feed)
    IcebergInterop.overwrite(spark.range(50, 53).toDF("id").coalesce(1), base)
    val e = intercept[IllegalStateException] {
      IcebergStream.syncFeed(spark, base, feed)
    }
    assert(e.getMessage.contains("non-append"))
    // ignore: the rewrite's additions never enter the feed
    IcebergStream.syncFeed(spark, base, feed, onRewrite = "ignore")
    val n = EventStreams.drainAvailableNow(
      IcebergStream.tail(spark, base, feed, onRewrite = "ignore")
        .agg(count(lit(1)).as("n"))).as[Long].head()
    assert(n == 5L) // only the first snapshot's rows
  }

  test("tailChangelog streams CDC rows equal to the batch derivation") {
    val base = freshBase("chg")
    val feed = freshBase("chg_feed")
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(100, 105).toDF("id").coalesce(1), base)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") % 2 === 0)
    val got = EventStreams.drainAvailableNow(
      IcebergStream.tailChangelog(spark, base, feed)
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s")))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    // initial load (10 rows) + append inserts (5); positional deletes
    // mask the even ids of BOTH files
    val delIds = (0L until 10L) ++ (100L until 105L)
    assert(got("insert") ==
      ((15L, (0L until 10L).sum + (100L until 105L).sum)))
    assert(got("delete") ==
      ((delIds.count(_ % 2 == 0).toLong, delIds.filter(_ % 2 == 0).sum)))
    // incremental: a compaction (replace) emits NOTHING; a new append
    // emits only its inserts
    IcebergInterop.rewriteDataFiles(spark, base)
    IcebergInterop.append(spark.range(200, 202).toDF("id").coalesce(1), base)
    IcebergStream.syncChangelogFeed(spark, base, feed)
    val again = EventStreams.drainAvailableNow(
      IcebergStream.tailChangelog(spark, base, feed)
        .groupBy(col("_change_type")).agg(count(lit(1)).as("n")))
      .as[(String, Long)].collect().toMap
    assert(again("insert") == 17L, s"replace leaked or append lost: $again")
    // idempotent: re-sync with no new snapshots changes nothing
    val head = IcebergStream.syncChangelogFeed(spark, base, feed)
    assert(head == IcebergInterop.snapshotIds(base).last)
  }

  test("changelog initial load fans out multi-part, not through one writer") {
    val base = freshBase("chgw")
    val feed = freshBase("chgw_feed")
    // first snapshot holds 4 data files — the bootstrap slice (whole
    // table as `insert`) must land as >1 feed file, one per table file
    // touched, never coalesce(1) through a single task
    IcebergInterop.overwrite(
      spark.range(1000).toDF("id").repartition(4), base)
    IcebergStream.syncChangelogFeed(spark, base, feed)
    val parts = new java.io.File(feed).listFiles()
      .filter(_.getName.startsWith("chg-")).map(_.getName).sorted
    assert(parts.length > 1, s"bootstrap funneled into one file: ${parts.toSeq}")
    assert(parts.head.endsWith("-p0.parquet"))
    // value-exact across the multi-part slice
    val got = EventStreams.drainAvailableNow(
      IcebergStream.tailChangelog(spark, base, feed)
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s")))
      .as[(Long, Long)].head()
    assert(got == ((1000L, (0L until 1000L).sum)))
    // crash-replay: parts link in DESCENDING index order with p0 last,
    // so a crash mid-link leaves a PREFIX missing — simulate by
    // dropping p0 + p1 and the marker; the resync must restage and
    // restore them put-if-absent without duplicating the surviving
    // parts (hash-on-all-columns makes part contents deterministic)
    new java.io.File(feed).listFiles()
      .filter(f => f.getName.endsWith("-p0.parquet") ||
        f.getName.endsWith("-p1.parquet")).foreach(_.delete())
    new java.io.File(feed, "_iceberg_changelog_sync.json").delete()
    IcebergStream.syncChangelogFeed(spark, base, feed)
    val replay = spark.read.parquet(
      new java.io.File(feed).listFiles()
        .filter(_.getName.startsWith("chg-")).map(_.getPath): _*)
    assert(replay.count() == 1000L)
    assert(replay.agg(sum(col("id"))).as[Long].head() == (0L until 1000L).sum)
  }

  test("an expired last-synced snapshot fails loudly, not silently stale") {
    val base = freshBase("exp")
    val feed = freshBase("exp_feed")
    IcebergInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base)
    IcebergStream.syncFeed(spark, base, feed) // synced snapshot 1
    IcebergInterop.append(spark.range(10, 12).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(20, 22).toDF("id").coalesce(1), base)
    IcebergInterop.expireSnapshots(spark, base, retainLast = 1) // 1 is gone
    // pre-fix behavior: dropWhile consumed the whole id list, returned
    // the stale synced id, and the stream silently stopped advancing
    val e = intercept[IllegalStateException] {
      IcebergStream.syncFeed(spark, base, feed)
    }
    assert(e.getMessage.contains("expired"))
  }

  test("a table with live delete files refuses the tail") {
    val base = freshBase("del")
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 2)
    val e = intercept[IllegalArgumentException] {
      IcebergStream.tail(spark, base, freshBase("del_feed"))
    }
    assert(e.getMessage.contains("delete files"))
  }

  test("a v3 vector REWRITE (same delete count) still classifies as a rewrite") {
    // a second DV delete on the same file REPLACES the vector: delete
    // count stays equal, only the path changes — tracked by path set,
    // not size, or the retraction silently never reaches the stream
    val base = freshBase("v3dv")
    IcebergInterop.overwrite(spark.range(12).toDF("id").coalesce(1), base,
      formatVersion = 3)
    val feed = freshBase("v3dv_feed")
    IcebergStream.syncFeed(spark, base, feed)                 // head synced
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 2)
    intercept[IllegalStateException] {
      IcebergStream.syncFeed(spark, base, feed)               // 0 → 1 vector
    }
    IcebergStream.syncFeed(spark, base, feed, onRewrite = "ignore")
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 4)
    val e = intercept[IllegalStateException] {
      IcebergStream.syncFeed(spark, base, feed)               // 1 → 1 REPLACED
    }
    assert(e.getMessage.contains("non-append"))
  }
}
