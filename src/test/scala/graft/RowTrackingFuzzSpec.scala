package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{DeltaDml, DeltaInterop}

/** Property fuzz for the row-tracking surface: seeded op sequences
  * (append / DV delete / copy-on-write update / merge with inserts /
  * optimize / reorg / zorder / checkpoint / restore) run against a
  * row-tracked Delta table while a driver model records each key's id
  * AS OBSERVED when the row first appeared. After EVERY op:
  *  - every surviving key still carries its recorded id (stability —
  *    the property the feature exists for);
  *  - every new key's id was never used before (uniqueness across
  *    history, deletes included);
  *  - the live id set has no duplicates.
  * No op may move an id: any rewrite that re-mints, any allocator that
  * reuses a burned range, any restore that regresses the mark shows up
  * as a diff here without hand-writing the interleaving. */
class RowTrackingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("rt_fuzz_").toFile
    d.deleteOnExit(); d.getPath
  }

  /** `mapped`: "none" (plain), "name" (logical↔physical names), or
    * "id" (resolution by parquet field id — DIVERGED physical names,
    * the Uniform/converted-table shape). Same op set, same model, same
    * invariants in every mode. */
  private def runSequence(seed: Int, nOps: Int,
                          mapped: String = "none"): Unit = {
    val rnd = new scala.util.Random(seed)
    val base = tmp()
    var nextKey = 100L
    // CDF on: every DML step also stages change rows, compounding the
    // coverage (cdc staging must never disturb id materialization)
    val cdf = Map("delta.enableChangeDataFeed" -> "true")
    val seedDf = spark.range(20).toDF("id").withColumn("v", lit(1L))
      .coalesce(1).sortWithinPartitions("id")
    mapped match {
      case "none" =>
        DeltaInterop.overwrite(seedDf, base, configuration = cdf)
      case "name" =>
        DeltaInterop.overwrite(seedDf, base, configuration = cdf)
        DeltaInterop.enableColumnMapping(spark, base)
      case "id" =>
        DeltaInterop.overwriteColumnMapped(seedDf, base,
          physicalFor = n => s"phys_$n", mode = "id", extraConfig = cdf)
    }
    DeltaInterop.enableRowTracking(spark, base)

    // key → recorded row id; everSeen = every id ever allocated to a
    // live row (a deleted row's id must never come back)
    var ids = Map.empty[Long, Long]
    val everSeen = scala.collection.mutable.Set.empty[Long]
    // restore points: (version, id-map at that point)
    val points = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, Long])]

    def observe(op: String): Unit = {
      val got = DeltaInterop.readWithRowIds(spark, base)
        .select(col("id"), col("_row_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val all = got.values.toSeq
      assert(all.distinct.size == all.size,
        s"seed=$seed after $op: duplicate live row ids")
      got.foreach { case (k, rid) =>
        ids.get(k) match {
          case Some(prev) => assert(prev == rid,
            s"seed=$seed after $op: key $k id moved $prev -> $rid")
          case None =>
            assert(!everSeen.contains(rid),
              s"seed=$seed after $op: key $k reused dead id $rid")
        }
      }
      // every key the model believes live must still be there (the
      // caller already removed deleted keys / rewound for restore);
      // anything beyond the model's set is a fresh insert, recorded now
      assert(ids.keySet.subsetOf(got.keySet),
        s"seed=$seed after $op: rows lost ${ids.keySet -- got.keySet}")
      ids = got
      everSeen ++= got.values
      points += ((DeltaInterop.snapshot(spark, base).version, ids))
    }
    observe("enable")

    (1 to nOps).foreach { _ =>
      rnd.nextInt(9) match {
        case 0 => // append fresh keys
          val n = 1 + rnd.nextInt(4)
          val ks = (0 until n).map(_ => { val k = nextKey; nextKey += 1; k })
          DeltaInterop.append(
            ks.toDF("id").withColumn("v", lit(2L)).coalesce(1), base)
          observe("append")
        case 1 if ids.nonEmpty => // DV delete
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          DeltaDml.deleteVectoredWhere(spark, base, col("id") % m === r)
          ids = ids.filterNot { case (k, _) => k % m == r }
          observe("delete")
        case 2 if ids.nonEmpty => // copy-on-write update
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          DeltaDml.updateWhere(spark, base, col("id") % m === r,
            Map("v" -> (col("v") + lit(1L))))
          observe("update")
        case 3 => // merge: update some existing + insert fresh keys
          val existing = ids.keys.toSeq.sorted.take(1 + rnd.nextInt(3))
          val fresh = (0 until 1 + rnd.nextInt(2)).map(_ =>
            { val k = nextKey; nextKey += 1; k })
          val src = (existing ++ fresh).map(k => (k, 9L)).toDF("id", "v")
          DeltaDml.mergeUpsert(spark, base, src, "id")
          observe("merge")
        case 4 => // optimize (bin-packed, id-materializing)
          DeltaInterop.optimize(spark, base, smallFileBytes = 1L << 20)
          observe("optimize")
        case 5 => // reorg purge
          DeltaInterop.reorgPurge(spark, base)
          observe("reorg")
        case 6 => // zorder re-clustering
          DeltaInterop.optimizeZorder(spark, base, Seq("v"),
            filesPerPartition = 2)
          observe("zorder")
        case 7 => // checkpoint (state must survive the replay cutover)
          DeltaInterop.checkpoint(spark, base)
          observe("checkpoint")
        case _ if points.nonEmpty => // restore: ids rewind WITH the rows
          val (v, pIds) = points(rnd.nextInt(points.size))
          DeltaInterop.restore(spark, base, v)
          ids = pIds
          observe("restore")
        case _ => ()
      }
    }
    // the whole fuzzed history must assemble as a change feed (cdc
    // actions where written, DV-aware file diffs elsewhere)
    val feed = DeltaDml.readChangeFeed(spark, base, fromVersion = 1L)
    assert(feed.count() >= 0L)
    assert(feed.columns.contains("_change_type") &&
      !feed.columns.exists(_.startsWith("_row_")))
  }

  test("seeded row-tracking sequences keep every id stable and unique") {
    runSequence(seed = 42, nOps = 16)
    runSequence(seed = 7, nOps = 16, mapped = "name")
    runSequence(seed = 2026, nOps = 24)
  }

  test("id-mode mapped sequences: field-id resolution end to end") {
    // the same op soup over a table whose physical names DIVERGE from
    // the logical schema — every read resolves by parquet field id and
    // every rewrite must restamp ids, or values silently NULL
    runSequence(seed = 11, nOps = 16, mapped = "id")
    runSequence(seed = 300, nOps = 20, mapped = "id")
  }
}
