package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.{DeltaDml, DeltaInterop}
import graft.streaming.{DeltaStream, EventStreams}

/** Streaming Delta CDF tail: the hard-link mirror + file-stream source
  * must deliver exactly the batch readChangeFeed's rows — cdc files
  * verbatim (with their own _change_type), file-diff commits via link
  * tags — and refuse un-mirrorable DV commits loudly. */
class DeltaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_dstream_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  test("streamed CDF equals the batch change feed (cdc + fallback commits)") {
    val base = freshBase("cdf")
    val feed = freshBase("cdf_feed")
    DeltaInterop.overwrite(
      (0L until 40L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1),
      base, configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaDml.updateWhere(spark, base, col("k") < 3,
      Map("v" -> (col("v") + 100.0)))                    // v1: cdc
    DeltaDml.deleteVectoredWhere(spark, base, col("k") >= 38) // v2: cdc
    DeltaInterop.append(Seq((100L, 1.5)).toDF("k", "v").coalesce(1), base) // v3
    val stream = DeltaStream.tailChangeFeed(spark, base, feed)
      .groupBy("_commit_version", "_change_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val got = EventStreams.drainAvailableNow(stream)
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = DeltaDml.readChangeFeed(spark, base, fromVersion = 0L)
      .groupBy("_commit_version", "_change_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == batch, s"stream $got != batch $batch")
    // and the shape is right: v0 inserts, v1 pre+post, v2 deletes, v3 insert
    val types = got.map(t => (t._1, t._2))
    assert(types == Set((0L, "insert"), (1L, "update_preimage"),
      (1L, "update_postimage"), (2L, "delete"), (3L, "insert")))
  }

  test("sync is idempotent and incremental; restarted stream keeps exactly-once") {
    val base = freshBase("inc")
    val feed = freshBase("inc_feed")
    DeltaInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    assert(DeltaStream.syncCdfFeed(base, feed) == 0L)
    assert(DeltaStream.syncCdfFeed(base, feed) == 0L) // no-op re-sync
    val n0 = new File(feed).listFiles().count(_.getName.endsWith(".parquet"))
    DeltaInterop.append(spark.range(5, 8).toDF("id").coalesce(1), base)
    assert(DeltaStream.syncCdfFeed(base, feed) == 1L)
    val n1 = new File(feed).listFiles().count(_.getName.endsWith(".parquet"))
    assert(n1 == n0 + 1)
    val total = EventStreams.drainAvailableNow(
      DeltaStream.tailChangeFeed(spark, base, feed)
        .groupBy("_change_type").agg(count(lit(1)).as("n")))
      .as[(String, Long)].collect().toMap
    assert(total == Map("insert" -> 8L))
  }

  test("a DV commit without cdc rows refuses loudly (no silent corruption)") {
    val base = freshBase("dvrefuse")
    val feed = freshBase("dvrefuse_feed")
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base) // no CDF
    DeltaDml.deleteVectoredWhere(spark, base, col("id") < 3) // DV, no cdc
    val e = intercept[IllegalArgumentException] {
      DeltaStream.syncCdfFeed(base, feed)
    }
    assert(e.getMessage.contains("deletion-vector") &&
      e.getMessage.contains("enableChangeDataFeed"))
  }

  test("a remove that OMITS the DV descriptor still refuses (tracked state)") {
    // the protocol does not require a remove action to repeat the
    // file's deletionVector — an external writer may omit it. The
    // mirror must still know the removed file carried a DV (its dead
    // rows would re-emit as deletes) from the adds it has seen.
    val base = freshBase("dvomit")
    val feed = freshBase("dvomit_feed")
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base) // v0
    val file = DeltaInterop.snapshot(spark, base).files.head.path
    DeltaInterop.deleteRowPositions(spark, base, file, Seq(0L, 1L))      // v1: DV
    DeltaInterop.overwrite(spark.range(100, 103).toDF("id").coalesce(1), base) // v2
    // strip the deletionVector field from v2's remove action, as an
    // external writer legally might
    val v2 = new File(base, "_delta_log/00000000000000000002.json")
    val rewritten = java.nio.file.Files.readAllLines(v2.toPath)
      .toArray.map(_.toString)
      .map(l => if (!l.contains("\"remove\"")) l else {
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(l)
        n.get("remove").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .remove("deletionVector")
        n.toString
      })
    java.nio.file.Files.writeString(v2.toPath, rewritten.mkString("\n"))
    val e = intercept[IllegalArgumentException] {
      DeltaStream.syncCdfFeed(base, feed)
    }
    assert(e.getMessage.contains("deletion-vector"))
  }

  test("partitioned CDF tail equals the batch feed; partition values recover from dirs") {
    val base = freshBase("part")
    val feed = freshBase("part_feed")
    // partition values exercise the Hive-escape surface: a '/', a ':',
    // an '=', and a NULL (→ __HIVE_DEFAULT_PARTITION__)
    val rows = Seq((1L, "a/b", 1.0), (2L, "x:y=z", 2.0), (3L, null, 3.0),
      (4L, "plain", 4.0), (5L, "plain", 5.0))
    DeltaInterop.overwrite(rows.toDF("k", "p", "v").repartition(1), base,
      partitionBy = Seq("p"),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaDml.updateWhere(spark, base, col("k") === 4L,
      Map("v" -> (col("v") + 100.0)))                         // v1: cdc
    DeltaDml.deleteVectoredWhere(spark, base, col("k") === 1L) // v2: cdc
    DeltaInterop.append(Seq((6L, "late", 6.0)).toDF("k", "p", "v")
      .coalesce(1), base, partitionBy = Seq("p"))              // v3: add
    val stream = DeltaStream.tailChangeFeed(spark, base, feed)
    val got = EventStreams.drainAvailableNow(stream, mode = "append")
      .as[(Long, String, Double, String, Long)].collect().toSet
    val batch = DeltaDml.readChangeFeed(spark, base, fromVersion = 0L)
      .select("k", "p", "v", "_change_type", "_commit_version")
      .as[(Long, String, Double, String, Long)].collect().toSet
    assert(got == batch, s"stream $got != batch $batch")
    // the partition column round-trips every escape shape, nulls included
    assert(got.map(_._2).contains("a/b") && got.map(_._2).contains("x:y=z")
      && got.exists(_._2 == null) && got.map(_._2).contains("late"))
  }

  test("skipChangeCommits drops a DV commit entirely; appends keep flowing") {
    val base = freshBase("skipchg")
    val feed = freshBase("skipchg_feed")
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base) // v0, no CDF
    DeltaDml.deleteVectoredWhere(spark, base, col("id") < 3)   // v1: DV, no cdc
    DeltaInterop.append(spark.range(100, 103).toDF("id").coalesce(1), base) // v2
    val got = EventStreams.drainAvailableNow(
      DeltaStream.tailChangeFeed(spark, base, feed, skipChangeCommits = true),
      mode = "append")
      .as[(Long, String, Long)].collect().toSet
    // v0's 10 inserts + v2's 3 — NOTHING for the skipped v1 (delta-spark's
    // skipChangeCommits contract: data-changing commits are ignored whole)
    assert(got.map(_._3) == Set(0L, 2L))
    assert(got.count(_._3 == 0L) == 10 && got.count(_._3 == 2L) == 3)
    assert(got.forall(_._2 == "insert"))
    // the default still refuses the same log loudly
    val e = intercept[IllegalArgumentException] {
      DeltaStream.syncCdfFeed(base, freshBase("skipchg_feed2"))
    }
    assert(e.getMessage.contains("skipChangeCommits"))
  }

  test("partitioned + column-mapped tables stream: physical dirs, logical rows") {
    val base = freshBase("partmapped")
    val feed = freshBase("partmapped_feed")
    DeltaInterop.overwriteColumnMapped(
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)).toDF("k", "p", "v")
        .repartition(1),
      base, physicalFor = n => s"phys_$n", partitionBy = Seq("p"),
      extraConfig = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaDml.updateWhere(spark, base, col("k") === 1L,
      Map("v" -> (col("v") + 100.0)))                          // v1: cdc
    val stream = DeltaStream.tailChangeFeed(spark, base, feed)
    val got = EventStreams.drainAvailableNow(stream, mode = "append")
      .as[(Long, String, Double, String, Long)].collect().toSet
    val batch = DeltaDml.readChangeFeed(spark, base, fromVersion = 0L)
      .select("k", "p", "v", "_change_type", "_commit_version")
      .as[(Long, String, Double, String, Long)].collect().toSet
    assert(got == batch, s"stream $got != batch $batch")
    // partition values resolved from phys_p=... dirs back to logical p
    assert(got.map(_._2) == Set("a", "b"))
  }

  test("column-mapped tables stream: physical-named mirror, logical rows") {
    val base = freshBase("mapped")
    val feed = freshBase("mapped_feed")
    DeltaInterop.overwrite(
      (0L until 10L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1),
      base, configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaInterop.enableColumnMapping(spark, base)
    DeltaInterop.renameColumn(spark, base, "v", "price")
    // mapped DML with CDF staging (physical-named cdc files), then a
    // mapped append (physical-named data file via the file-diff tag)
    DeltaDml.updateWhere(spark, base, col("k") < 2,
      Map("price" -> (col("price") + 100.0)))
    DeltaInterop.append(Seq((50L, 5.0)).toDF("k", "price").coalesce(1), base)
    val stream = DeltaStream.tailChangeFeed(spark, base, feed)
      .groupBy("_change_type")
      .agg(count(lit(1)).as("n"), sum(col("price")).as("sp"))
    val got = EventStreams.drainAvailableNow(stream)
      .as[(String, Long, Double)].collect()
      .map { case (t, n, sp) => t -> ((n, sp)) }.toMap
    // a logical-named scan of physical files would read price as NULL —
    // the sums prove the physical→logical resolution end to end
    assert(got("insert") ==
      ((11L, (0L until 10L).map(_ * 1.0).sum + 5.0)), s"got $got")
    assert(got("update_preimage") == ((2L, 1.0)), s"got $got")
    assert(got("update_postimage") == ((2L, 201.0)), s"got $got")
  }
}
