package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.IcebergInterop

/** Streaming SOURCE over an Iceberg table — the third leg of the
  * streaming-source triangle (graft-log: `GraftLogStream`, Delta CDF:
  * `DeltaStream`), same public-API design: a snapshot-driven hard-link
  * mirror + Spark's checkpointed parquet file stream (exactly-once
  * across restarts from the file source's offset log).
  *
  * Per snapshot the mirror links the data files that are NEW relative
  * to the previous snapshot (manifest-list diff, driver metadata walk
  * only). Non-append snapshots follow the same contract as the other
  * mirrors via `onRewrite`:
  *  - "fail" (default): a snapshot that removed files or added DELETE
  *    files is an error — append-only streams must not silently skip
  *    retractions;
  *  - "ignore": skip the snapshot's additions entirely;
  *  - "reemit": link its added data files anyway (at-least-once
  *    re-emission of carried rows — Spark's ignoreChanges).
  * The FIRST snapshot is always streamed (load-then-tail). Tables with
  * live position/equality deletes at tail time are refused: a file
  * stream cannot subtract them (use the batch reader or
  * `readChangelog`). */
object IcebergStream {

  private val SyncMarker = "_iceberg_sync.json"
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def syncedSnapshot(feedDir: String): Option[Long] = {
    val f = new File(feedDir, SyncMarker)
    if (!f.exists()) None
    else Some(mapper.readTree(f).get("syncedSnapshotId").asLong())
  }

  /** Advance the feed mirror to the current snapshot head. Idempotent
    * and crash-safe (EEXIST is success; the marker lands atomically
    * after all links). Returns the synced snapshot id (or -1 for an
    * empty table). */
  def syncFeed(spark: SparkSession, base: String, feedDir: String,
               onRewrite: String = "fail"): Long = {
    require(Set("fail", "ignore", "reemit").contains(onRewrite),
      s"onRewrite must be fail|ignore|reemit, got '$onRewrite'")
    new File(feedDir).mkdirs()
    val ids = IcebergInterop.snapshotIds(base)
    if (ids.isEmpty) return -1L
    val from = syncedSnapshot(feedDir)
    // the last-synced snapshot MUST still be in the table: if it was
    // expired (expireSnapshots), dropWhile would consume the whole id
    // list, `fresh` would be empty, and the stream would silently stop
    // seeing new snapshots forever — silent data loss. Fail loudly.
    from.foreach { sid =>
      if (!ids.contains(sid)) throw new IllegalStateException(
        s"iceberg stream feed $feedDir last synced snapshot $sid, which " +
        s"has been expired from $base (have ${ids.mkString(",")}) — the " +
        "diff base is gone; restart the feed from a fresh directory (the " +
        "current table state will re-stream) or re-seed the mirror")
    }
    val fresh = from match {
      case None => ids
      case Some(sid) => ids.dropWhile(_ != sid).drop(1)
    }
    if (fresh.isEmpty) return from.getOrElse(-1L)
    // previous file set for the diff (None for the very first snapshot)
    var prevFiles: Set[String] = from match {
      case None => Set.empty
      case Some(sid) =>
        IcebergInterop.snapshot(spark, base, Some(sid)).files
          .map(_.rawPath).toSet
    }
    var prevDeletes: Int = from match {
      case None => 0
      case Some(sid) =>
        val s = IcebergInterop.snapshot(spark, base, Some(sid))
        s.deletes.size + s.eqDeletes.size
    }
    fresh.foreach { sid =>
      val snap = IcebergInterop.snapshot(spark, base, Some(sid))
      val paths = snap.files.map(f => f.rawPath -> f.path).toMap
      val added = paths.keySet -- prevFiles
      val removed = prevFiles -- paths.keySet
      val newDeletes = (snap.deletes.size + snap.eqDeletes.size) > prevDeletes
      val isRewrite = (removed.nonEmpty || newDeletes) && prevFiles.nonEmpty
      val link: Boolean =
        if (!isRewrite) true
        else onRewrite match {
          case "fail" => throw new IllegalStateException(
            s"iceberg stream over $base hit non-append snapshot $sid " +
            "(removed files or added delete files); pass " +
            "onRewrite=ignore|reemit or use readChangelog")
          case "ignore" => false
          case "reemit" => true
        }
      if (link) added.foreach { raw =>
        val src = Paths.get(paths(raw))
        val flat = s"s$sid-${src.getFileName}"
        try Files.createLink(Paths.get(feedDir, flat), src)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
      prevFiles = paths.keySet
      prevDeletes = snap.deletes.size + snap.eqDeletes.size
    }
    val head = fresh.last
    val tmp = Paths.get(feedDir, s".tmp_sync_${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, s"""{"syncedSnapshotId":$head}""")
    Files.move(tmp, Paths.get(feedDir, SyncMarker),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    head
  }

  /** The table as a streaming DataFrame: one sync, then Spark's parquet
    * file stream over the mirror (schema pinned from the table, so
    * evolution-era files read missing columns as null). Re-call
    * `syncFeed` to surface snapshots landing while the stream runs. */
  def tail(spark: SparkSession, base: String, feedDir: String,
           onRewrite: String = "fail",
           options: Map[String, String] = Map.empty): DataFrame = {
    val snap = IcebergInterop.snapshot(spark, base)
    require(snap.deletes.isEmpty && snap.eqDeletes.isEmpty,
      "iceberg stream tail cannot subtract live delete files — compact " +
      "first, or use the batch read / readChangelog")
    // identity-partitioned tables stream fine: this writer keeps the
    // partition columns IN the data files (manifests only add pruning)
    syncFeed(spark, base, feedDir, onRewrite)
    spark.readStream.schema(snap.schema).options(options).parquet(feedDir)
  }
}
