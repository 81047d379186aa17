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
