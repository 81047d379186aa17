package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop

/** `expire_snapshots` semantics the oracle query (q163) can't observe:
  * shared-file survival across an append chain, retainLast counts,
  * delete-file liveness, and the no-op path. */
class IcebergMaintenanceSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("ice_maint_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("sorted rewrite: disjoint ranges make range reads prune files") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = tmp()
    // 6 appends of interleaved key ranges: every file spans ~the whole
    // key space, so a narrow range read must open all of them
    val keys = new scala.util.Random(7).shuffle((0L until 600L).toVector)
    IcebergInterop.overwrite(
      keys.take(100).map(k => (k, k * 2)).toDF("k", "v").coalesce(1), base)
    keys.drop(100).grouped(100).foreach { g =>
      IcebergInterop.append(
        g.map(k => (k, k * 2)).toDF("k", "v").coalesce(1), base)
    }
    IcebergInterop.deletePositionsWhere(spark, base, col("k") % 50 === 0)
    val before = IcebergInterop
      .readRange(spark, base, "k", Some(100L), Some(140L))
      .inputFiles.length
    // 6 data files + the position-delete sidecar the anti-join scans
    assert(before >= 6, s"interleaved layout should admit all files: $before")
    IcebergInterop.rewriteDataFilesSorted(spark, base, Seq("k"),
      filesPerPartition = 6)
    // value-exact: deletes folded, nothing lost or doubled
    assert(IcebergInterop.read(spark, base).select("k").as[Long]
      .collect().sorted.toSeq == (0L until 600L).filter(_ % 50 != 0))
    val after = IcebergInterop
      .readRange(spark, base, "k", Some(100L), Some(140L))
      .inputFiles.length
    assert(after <= 2, s"sorted layout should prune to 1-2 files: $after")
    // refusal: sorting a partition column is meaningless
    val pbase = tmp()
    IcebergInterop.overwrite(
      Seq((1L, "A")).toDF("k", "g"), pbase, Seq("g"))
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.rewriteDataFilesSorted(spark, pbase, Seq("g"))
    }
    assert(e.getMessage.contains("partition column"))
  }

  test("refs: tags pin snapshots against expiration; reads resolve by name") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    val v1 = IcebergInterop.snapshotIds(base).head
    IcebergInterop.createTag(base, "corpus-v1", v1)
    IcebergInterop.overwrite(spark.range(100, 105).toDF("id").coalesce(1), base)
    // refs survive later commits (the metadata rebuild carries them)
    IcebergInterop.append(spark.range(105, 107).toDF("id").coalesce(1), base)
    assert(IcebergInterop.refs(base).map(r => (r._1, r._2)) ==
      Seq(("corpus-v1", "tag")))
    // the tagged snapshot is PINNED: expire keeps it readable
    IcebergInterop.expireSnapshots(spark, base)
    assert(IcebergInterop.readRef(spark, base, "corpus-v1").count() == 10)
    assert(IcebergInterop.read(spark, base).count() == 7)
    // 'main' resolves to the current snapshot
    assert(IcebergInterop.readRef(spark, base, "main").count() == 7)
    // drop unpins: the next expire reclaims it
    IcebergInterop.dropRef(base, "corpus-v1")
    IcebergInterop.expireSnapshots(spark, base)
    intercept[Exception] {
      IcebergInterop.read(spark, base, Some(v1)).collect()
    }
  }

  test("refs: tags immutable, branches movable, unknown snapshots refuse") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(5, 8).toDF("id").coalesce(1), base)
    val Seq(s1, s2) = IcebergInterop.snapshotIds(base)
    IcebergInterop.createTag(base, "t", s1)
    intercept[IllegalArgumentException] {
      IcebergInterop.createTag(base, "t", s2) // immutable
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.setBranch(base, "t", s2) // a tag is not a branch
    }
    IcebergInterop.createBranch(base, "dev", s1)
    assert(IcebergInterop.readRef(spark, base, "dev").count() == 5)
    IcebergInterop.setBranch(base, "dev", s2) // fast-forward
    assert(IcebergInterop.readRef(spark, base, "dev").count() == 8)
    intercept[IllegalArgumentException] {
      IcebergInterop.createBranch(base, "x", 99999L)
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.createTag(base, "main", s1)
    }
    // SQL: VERSION AS OF a ref name on a registered Iceberg table
    graft.pipeline.GraftSql.registerIcebergTable(spark, "refs_t", base)
    val n = graft.pipeline.GraftSql.sql(spark,
      "SELECT count(*) AS n FROM refs_t VERSION AS OF 't'")
      .head().getLong(0)
    assert(n == 5)
    // ...but a ref name on a Delta/graft-log table refuses loudly
    val dbase = tmp()
    graft.sources.DeltaInterop.overwrite(
      spark.range(3).toDF("id").coalesce(1), dbase)
    graft.pipeline.GraftSql.registerDeltaTable(spark, "refs_d", dbase)
    val err = intercept[IllegalArgumentException] {
      graft.pipeline.GraftSql.sql(spark,
        "SELECT count(*) AS n FROM refs_d VERSION AS OF 'nope'").collect()
    }
    assert(err.getMessage.contains("Iceberg feature"))
  }

  test("rewriteManifests folds data manifests, keeps seqs and deletes exact") {
    import spark.implicits._
    val base = tmp()
    // 4 appends → 4 data manifests; a keyed upsert adds an equality
    // delete whose strict sequence gate depends on PER-FILE seqs
    IcebergInterop.overwrite(
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").coalesce(1), base)
    IcebergInterop.append(Seq((3L, 3.0)).toDF("k", "v").coalesce(1), base)
    IcebergInterop.append(Seq((4L, 4.0)).toDF("k", "v").coalesce(1), base)
    IcebergInterop.mergeUpsert(spark, base,
      Seq((2L, 22.0), (5L, 5.0)).toDF("k", "v").coalesce(1), Seq("k"))
    val before = IcebergInterop.read(spark, base).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(before == Seq((1L, 1.0), (2L, 22.0), (3L, 3.0), (4L, 4.0), (5L, 5.0)))
    val nManifestsBefore = IcebergInterop.filesTable(spark, base).count()
    IcebergInterop.rewriteManifests(spark, base)
    // value-exact after the fold: the equality delete must STILL mask
    // only files strictly below its sequence (post-upsert row survives)
    val after = IcebergInterop.read(spark, base).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(after == before, "manifest fold changed query results")
    // one data manifest remains (plus the delete manifest)
    val metaDir = new java.io.File(base, "metadata")
    val folded = metaDir.listFiles().filter(_.getName.startsWith("manifest-folded-"))
    assert(folded.length == 1)
    // history intact: pre-fold snapshot still time-travels
    val ids = IcebergInterop.snapshotIds(base)
    assert(IcebergInterop.read(spark, base, Some(ids.head)).count() == 2)
    // idempotent: a second fold is a no-op (already one data manifest)
    val cur = ids.last
    assert(IcebergInterop.rewriteManifests(spark, base) == cur)
    // partitioned leg: partition records survive typed (pruning works)
    val pbase = tmp()
    IcebergInterop.overwrite(
      Seq((1L, "x"), (2L, "y")).toDF("k", "p").coalesce(1), pbase, Seq("p"))
    IcebergInterop.append(
      Seq((3L, "x")).toDF("k", "p").coalesce(1), pbase, Seq("p"))
    IcebergInterop.rewriteManifests(spark, pbase)
    val eq = IcebergInterop.readEq(spark, pbase, Map("p" -> "x"))
    assert(eq.count() == 2)
    assert(eq.inputFiles.length == 2, "partition pruning must still prune")
    assert(IcebergInterop.partitionsTable(spark, pbase)
      .orderBy("partition").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("p=x", 2L), ("p=y", 1L)))
  }

  test("partitions/refs/history metadata tables read manifests, not data") {
    import spark.implicits._
    val base = tmp()
    val df = (0L until 30L).map(k => (k, (k % 3).toString)).toDF("k", "p")
    IcebergInterop.overwrite(df.coalesce(1), base, Seq("p"))
    IcebergInterop.append(
      Seq((100L, "0"), (101L, "0")).toDF("k", "p").coalesce(1), base,
      Seq("p"))
    val parts = IcebergInterop.partitionsTable(spark, base)
      .orderBy("partition").collect()
    assert(parts.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("p=0", 12L), ("p=1", 10L), ("p=2", 10L)))
    // p=0 spans both commits → 2 files; bytes are summed and real
    val p0 = parts.head
    assert(p0.getLong(2) == 2L)
    assert(p0.getLong(3) > 0L, "file_size_in_bytes must come from manifests")
    val Seq(s1, s2) = IcebergInterop.snapshotIds(base)
    IcebergInterop.createTag(base, "v1", s1)
    val refs = IcebergInterop.refsTable(spark, base)
      .orderBy("name").collect()
    assert(refs.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq(("main", "branch", s2), ("v1", "tag", s1)))
    val hist = IcebergInterop.historyTable(spark, base)
      .orderBy("made_current_at_ms").collect()
    assert(hist.map(_.getLong(1)).toSeq == Seq(s1, s2))
    assert(hist.map(_.getBoolean(2)).toSeq == Seq(false, true))
  }

  test("expire deletes only files unreachable from retained snapshots") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    IcebergInterop.overwrite(spark.range(100, 105).toDF("id").coalesce(1), base)
    val Seq(old, cur) = IcebergInterop.snapshotIds(base)
    val dead = IcebergInterop.expireSnapshots(spark, base)
    assert(dead.nonEmpty, "the overwritten snapshot's files should be deleted")
    assert(IcebergInterop.snapshotIds(base) == Seq(cur))
    assert(IcebergInterop.read(spark, base).count() == 5)
    intercept[Exception] {
      IcebergInterop.read(spark, base, Some(old)).collect()
    }
  }

  test("append-chain shared files survive expiration") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(10, 20).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(20, 30).toDF("id").coalesce(1), base)
    // snapshot 1's data file is also reachable from snapshot 3 — it
    // must survive even though snapshots 1 and 2 expire
    val dead = IcebergInterop.expireSnapshots(spark, base)
    assert(!dead.exists(_.endsWith(".parquet")),
      s"append-chain data files are all still live, but expire deleted $dead")
    val got = IcebergInterop.read(spark, base)
    assert(got.count() == 30)
    assert(got.agg(sum("id")).head().getLong(0) == (0 until 30).sum)
  }

  test("retainLast keeps that many snapshots; full retention is a no-op") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(5, 8).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(8, 12).toDF("id").coalesce(1), base)
    assert(IcebergInterop.expireSnapshots(spark, base, retainLast = 3).isEmpty)
    assert(IcebergInterop.snapshotIds(base).size == 3)
    IcebergInterop.expireSnapshots(spark, base, retainLast = 2)
    val ids = IcebergInterop.snapshotIds(base)
    assert(ids.size == 2)
    // both retained snapshots still read correctly
    assert(IcebergInterop.read(spark, base).count() == 12)
    assert(IcebergInterop.read(spark, base, Some(ids.head)).count() == 8)
  }

  test("expire after rollback keeps the snapshots array chronological") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(4).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(4, 6).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(6, 8).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(8, 10).toDF("id").coalesce(1), base)
    val Seq(s1, s2, s3, s4) = IcebergInterop.snapshotIds(base)
    IcebergInterop.rollbackTo(base, s1) // current = s1, array order s1..s4
    // retain the newest 2 (s3, s4) + current (s1): the pruned array
    // must stay in ORIGINAL (chronological) order — takeRight ++ current
    // would write [s3, s4, s1] and break the oldest-first assumption the
    // next expire's takeRight and snapshotIds rely on
    IcebergInterop.expireSnapshots(spark, base, retainLast = 2)
    assert(IcebergInterop.snapshotIds(base) == Seq(s1, s3, s4),
      s"snapshots array must stay chronological after rollback+expire")
    assert(IcebergInterop.read(spark, base).count() == 4)       // current s1
    assert(IcebergInterop.read(spark, base, Some(s4)).count() == 10)
  }

  test("live position-delete files survive expiration") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    val dataPath = IcebergInterop.snapshot(spark, base).files.head.rawPath
    IcebergInterop.addPositionDeletes(spark, base, Seq(dataPath -> Seq(0L, 1L)))
    IcebergInterop.append(spark.range(100, 103).toDF("id").coalesce(1), base)
    // expire down to the current snapshot: the delete file is still
    // ACTIVE (carried forward by the append's manifest list) and must
    // keep masking rows 0 and 1
    IcebergInterop.expireSnapshots(spark, base)
    val got = IcebergInterop.read(spark, base).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == ((2L to 9L) ++ (100L to 102L)),
      s"position deletes lost after expire: ${got.toSeq}")
  }

  import spark.implicits._

  test("rewriteDataFiles bin-packs small files; values and count survive") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    (1 to 5).foreach(i => IcebergInterop.append(
      spark.range(i * 100L, i * 100L + 3).toDF("id").coalesce(1), base))
    val before = IcebergInterop.snapshot(spark, base)
    assert(before.files.size == 6)
    val sid = IcebergInterop.rewriteDataFiles(spark, base)
    val after = IcebergInterop.snapshot(spark, base)
    assert(after.snapshotId == sid)
    assert(after.files.size == 1, s"expected 1 packed file: ${after.files}")
    // value-exact across the rewrite
    val got = IcebergInterop.read(spark, base).as[Long].collect().sorted.toSeq
    val want = ((0L until 10L) ++
      (1 to 5).flatMap(i => i * 100L until i * 100L + 3)).sorted
    assert(got == want)
    // compaction is not a logical change: changelog emits nothing for it
    val ids = IcebergInterop.snapshotIds(base)
    val chg = IcebergInterop.readChangelog(spark, base, ids(ids.size - 2))
    assert(chg.count() == 0, "replace snapshot leaked into the changelog")
  }

  test("rewriteDataFiles folds deletes in and drops dead delete files") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(100, 110).toDF("id").coalesce(1), base)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") % 2 === 0)
    IcebergInterop.addEqualityDeletes(spark, base,
      Seq(101L).toDF("id"), Seq("id"))
    assert(IcebergInterop.snapshot(spark, base).deletes.nonEmpty)
    IcebergInterop.rewriteDataFiles(spark, base)
    val after = IcebergInterop.snapshot(spark, base)
    // every data file was rewritten → all delete files are dead weight
    assert(after.deletes.isEmpty && after.eqDeletes.isEmpty,
      s"dead delete files carried: ${after.deletes} ${after.eqDeletes}")
    val got = IcebergInterop.read(spark, base).as[Long].collect().sorted.toSeq
    val want = ((0L until 10L) ++ (100L until 110L))
      .filter(i => i % 2 != 0 && i != 101L)
    assert(got == want, s"fold lost rows: $got")
    // the stream tail's precondition (no live deletes) now holds
    assert(after.files.nonEmpty)
  }

  test("rewriteDataFiles keeps survivors by name and respects partitions") {
    val base = tmp()
    val big = (0L until 50L).map(i => (i, if (i < 25) "a" else "b"))
      .toDF("id", "p")
    IcebergInterop.overwrite(big, base, partitionBy = Seq("p"))
    // two small appends into partition a only; partition b untouched
    IcebergInterop.append(Seq((1000L, "a")).toDF("id", "p"), base, Seq("p"))
    IcebergInterop.append(Seq((1001L, "a")).toDF("id", "p"), base, Seq("p"))
    val before = IcebergInterop.snapshot(spark, base)
    val bFiles = before.files.filter(_.partitionValues.get("p").contains("b"))
      .map(_.rawPath).toSet
    IcebergInterop.rewriteDataFiles(spark, base, minInputFiles = 2)
    val after = IcebergInterop.snapshot(spark, base)
    // b-partition files survive BY NAME; a-partition packed into one
    assert(after.files.filter(_.partitionValues.get("p").contains("b"))
      .map(_.rawPath).toSet == bFiles, "survivors must keep their files")
    val aFiles = after.files.filter(_.partitionValues.get("p").contains("a"))
    assert(aFiles.size == 1, s"partition a not packed: $aFiles")
    // partition pruning still works over the compacted manifests
    val got = IcebergInterop.read(spark, base,
      partitionFilters = Map("p" -> "a")).as[(Long, String)].collect()
    assert(got.map(_._1).sorted.toSeq == ((0L until 25L) ++ Seq(1000L, 1001L)))
    assert(IcebergInterop.read(spark, base).count() == 52)
  }

  test("rewriteDataFiles is a no-op below minInputFiles") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    val cur = IcebergInterop.snapshot(spark, base).snapshotId
    assert(IcebergInterop.rewriteDataFiles(spark, base) == cur)
    assert(IcebergInterop.snapshotIds(base).size == 1)
  }

  test("removeOrphanFiles deletes only unreachable files past the grace cutoff") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(20).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(20, 30).toDF("id").coalesce(1), base)
    // a failed commit's leftovers: a stray data file + a stray manifest
    val oldOrphan = new File(base, "data/stray-attempt.parquet")
    Files.writeString(oldOrphan.toPath, "not really parquet")
    oldOrphan.setLastModified(1000L)
    val oldManifest = new File(base, "metadata/stray-manifest.avro")
    Files.writeString(oldManifest.toPath, "junk")
    oldManifest.setLastModified(1000L)
    // a CONCURRENT writer's staged file: orphan-shaped but recent
    val recent = new File(base, "data/in-flight.parquet")
    Files.writeString(recent.toPath, "staged by a live writer")
    recent.setLastModified(System.currentTimeMillis())
    val before = IcebergInterop.read(spark, base).as[Long].collect().sorted.toSeq

    val deleted = IcebergInterop.removeOrphanFiles(spark, base,
      olderThanMs = Some(System.currentTimeMillis() - 60000))
    assert(deleted.toSet ==
      Set("data/stray-attempt.parquet", "metadata/stray-manifest.avro"))
    assert(!oldOrphan.exists() && !oldManifest.exists())
    assert(recent.exists(), "grace period must protect in-flight files")
    // every live file survived: value-exact read, both snapshots intact
    assert(IcebergInterop.read(spark, base).as[Long].collect().sorted.toSeq
      == before)
    val Seq(first, _) = IcebergInterop.snapshotIds(base)
    assert(IcebergInterop.read(spark, base, Some(first)).count() == 20)
  }

  test("removeOrphanFiles keeps files any on-disk metadata version reaches") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base)
    IcebergInterop.overwrite(spark.range(100, 103).toDF("id").coalesce(1), base)
    // the v1 snapshot's files are unreachable from the CURRENT snapshot
    // but still referenced by the older metadata.json on disk — orphan
    // cleanup must not collect what expireSnapshots owns
    val deleted = IcebergInterop.removeOrphanFiles(spark, base,
      olderThanMs = Some(System.currentTimeMillis() + 60000))
    assert(deleted.isEmpty,
      s"metadata-reachable files must survive, deleted: $deleted")
    // and after expiration the old files are gone via expire, leaving
    // nothing for orphan cleanup either
    IcebergInterop.expireSnapshots(spark, base)
    val deleted2 = IcebergInterop.removeOrphanFiles(spark, base,
      olderThanMs = Some(System.currentTimeMillis() + 60000))
    assert(deleted2.isEmpty)
    assert(IcebergInterop.read(spark, base).as[Long].collect().sorted.toSeq
      == Seq(100L, 101L, 102L))
  }
}
