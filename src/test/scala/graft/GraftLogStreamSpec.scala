package graft

import java.io.File

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.pipeline.GraftLog
import graft.streaming.GraftLogStream

/** Streaming-source coverage: commit-driven feed mirror + file stream. */
class GraftLogStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): (String, String, String) = {
    val base = s"/tmp/graft_test_stream_${name}_table"
    val feed = s"/tmp/graft_test_stream_${name}_feed"
    val ckpt = s"/dev/shm/graft_test_stream_${name}_ckpt"
    Seq(base, feed, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new File(p)))
    (base, feed, ckpt)
  }

  /** Drain the feed's stream with a STABLE checkpoint, collecting each
    * micro-batch's rows — the restartable consumer the exactly-once
    * assertions need (drainAvailableNow uses an ephemeral checkpoint). */
  private def drainTo(buf: mutable.Buffer[(Long, String)], base: String,
                      feed: String, ckpt: String): Unit = {
    GraftLogStream.tail(spark, base, feed).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized { buf ++= batch.as[(Long, String)].collect() }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("tail streams committed rows exactly once across restarts; new commits arrive incrementally") {
    val (base, feed, ckpt) = fresh("e2e")
    GraftLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "x"), base)
    GraftLog.append(Seq((3L, "c")).toDF("k", "x"), base)
    val got = mutable.Buffer.empty[(Long, String)]
    drainTo(got, base, feed, ckpt)
    assert(got.sorted.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // new commit + restart on the SAME checkpoint: only the delta arrives
    GraftLog.append(Seq((4L, "d")).toDF("k", "x"), base)
    got.clear()
    drainTo(got, base, feed, ckpt)
    assert(got.toSeq == Seq((4L, "d")))
    // no new commits → restart delivers nothing
    got.clear()
    drainTo(got, base, feed, ckpt)
    assert(got.isEmpty)
  }

  test("staged-but-uncommitted files never reach the feed") {
    val (base, feed, _) = fresh("staged")
    GraftLog.overwrite(Seq((1L, "a")).toDF("k", "x"), base)
    // a torn writer: files staged into the table dir, commit never lands
    GraftLog.stageFiles(Seq((99L, "phantom")).toDF("k", "x"), base)
    GraftLogStream.syncFeed(base, feed)
    val linked = Option(new File(feed).listFiles()).get
      .map(_.getName).filter(!_.startsWith("_")).toSeq
    assert(linked.size == 1 && linked.head.startsWith("v"))
  }

  test("syncFeed is idempotent and crash-safe (rerun converges, no duplicate links)") {
    val (base, feed, _) = fresh("idem")
    GraftLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "x"), base)
    GraftLogStream.syncFeed(base, feed)
    val first = Option(new File(feed).listFiles()).get.map(_.getName).toSet
    // simulate a crash between linking and the marker write: delete the
    // marker, resync — links already present must be treated as success
    Seq.fill(2) {
      org.apache.commons.io.FileUtils.deleteQuietly(new File(feed, "_sync.json"))
      GraftLogStream.syncFeed(base, feed)
    }
    val after = Option(new File(feed).listFiles()).get.map(_.getName).toSet
    assert(after == first)
  }

  test("non-append commits: fail by default, ignore skips, reemit re-links") {
    val (base, feed, _) = fresh("rewrite")
    GraftLog.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), base)
    GraftLogStream.syncFeed(base, feed)
    GraftLog.upsert(spark, base, Seq((2L, 22.0)).toDF("k", "v"), Seq("k"))
    intercept[IllegalStateException] { GraftLogStream.syncFeed(base, feed) }
    // ignore: the merge commit is skipped entirely; high-water advances
    val vIgnore = GraftLogStream.syncFeed(base, feed, onRewrite = "ignore")
    assert(vIgnore == GraftLog.currentVersion(base).get)
    val afterIgnore = Option(new File(feed).listFiles()).get
      .map(_.getName).count(_.startsWith("v"))
    // reemit on a FRESH feed: the merge's added files do get linked
    val feed2 = feed + "2"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(feed2))
    GraftLogStream.syncFeed(base, feed2, onRewrite = "reemit")
    val reemitted = Option(new File(feed2).listFiles()).get
      .map(_.getName).count(_.startsWith("v"))
    assert(reemitted > afterIgnore)
  }

  test("streamed change feed nets equal the batch readChangeFeed over a DML history") {
    val (base, feed, _) = fresh("cdf")
    GraftLog.overwriteClustered(
      (0L until 100L).map(k => (k, k % 4, 1.0)).toDF("k", "g", "v"),
      base, Seq("k"), nFiles = 4)
    GraftLog.upsert(spark, base,
      (0L until 10L).map(k => (k, k % 4, 5.0)).toDF("k", "g", "v"), Seq("k"))
    GraftLog.delete(spark, base, col("k") >= 50 && col("k") < 75,
      scope = Some(("k", 50L, 74L)))
    def nets(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
      df.filter(col("_commit_version") > 1)
        .withColumn("sgn",
          when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
        .groupBy(col("g"))
        .agg(sum(col("sgn")).as("n"), sum(col("v") * col("sgn")).as("s"))
        .filter(col("n") =!= 0 || col("s") =!= 0)
        .select(col("g"), col("n"), col("s"))
        .as[(Long, Long, Double)].collect()
        .map { case (g, n, s) => g -> (n, s) }.toMap
    val streamed = nets(graft.streaming.EventStreams.drainAvailableNow(
      GraftLogStream.tailChangeFeed(spark, base, feed), mode = "append"))
    val batch = nets(GraftLog.readChangeFeed(spark, base, fromVersion = 2))
    assert(streamed == batch && streamed.nonEmpty)
    // total net rows: the upsert's delete+insert pairs cancel (+10 −10),
    // leaving exactly the range-delete's −25 spread across the groups
    assert(streamed.values.map(_._1).sum == -25 + 10 - 10)
  }

  test("CDF mirror is idempotent; insert and delete links share the inode (zero copy)") {
    val (base, feed, _) = fresh("cdfidem")
    GraftLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "x"), base)
    GraftLog.upsert(spark, base, Seq((2L, "B")).toDF("k", "x"), Seq("k"))
    GraftLogStream.syncCdfFeed(base, feed)
    val names = Option(new File(feed).listFiles()).get
      .map(_.getName).filter(_.startsWith("v")).toSeq
    // v1 add + v2's removed v1-file + v2's added file ⇒ the v1 data file
    // appears under BOTH an -i- (v1) and a -d- (v2) name
    assert(names.exists(_.matches("^v0*1-i-.*")) &&
      names.exists(_.matches("^v0*2-d-.*")) &&
      names.exists(_.matches("^v0*2-i-.*")))
    // crash between links and marker: resync converges to the same set
    org.apache.commons.io.FileUtils.deleteQuietly(new File(feed, "_cdf_sync.json"))
    GraftLogStream.syncCdfFeed(base, feed)
    val after = Option(new File(feed).listFiles()).get
      .map(_.getName).filter(_.startsWith("v")).toSeq
    assert(after.sorted == names.sorted)
  }

  test("tail reads evolution-era history under the head schema") {
    val (base, feed, _) = fresh("evo")
    GraftLog.overwrite(Seq((1L, "a")).toDF("k", "x"), base)
    GraftLog.append(Seq((2L, "b", 7.5)).toDF("k", "x", "score"), base)
    val rows = graft.streaming.EventStreams.drainAvailableNow(
      GraftLogStream.tail(spark, base, feed), mode = "append")
      .select("k", "score").as[(Long, Option[Double])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(7.5)))
  }
}
