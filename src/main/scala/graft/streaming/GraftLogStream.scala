package graft.streaming


import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.GraftLog
import graft.sources.TableIO

/** Streaming SOURCE over a graft-log table — the Delta-streaming-source
  * analogue that completes the table format's streaming story (the sink
  * side already exists: `EventStreams.streamIngestGraftLog` /
  * `streamMergeGraftLog`).
  *
  * Mechanism: a COMMIT-DRIVEN mirror. `syncFeed` tails the commit log
  * and hard-links each newly-committed data file into `feedDir` under a
  * version-prefixed name; `tail` reads `feedDir` with Spark's built-in
  * parquet file stream, whose checkpointed file index provides
  * exactly-once delivery across restarts. Everything stays public-API
  * Spark — the file source does the heavy lifting (listing, offset
  * tracking, batch planning, parquet decode) and this object only
  * decides WHICH files become visible, from the log:
  *
  *  - Files are linked only after their commit is PUBLISHED, so a
  *    concurrent writer's staged-but-uncommitted files (which sit in the
  *    table directory, invisible to the log) can never leak into the
  *    stream — the isolation guarantee a raw `readStream.parquet(base)`
  *    on the table directory cannot give.
  *  - Hard links are zero-copy and atomic; a crash between linking and
  *    the high-water-mark write just relinks idempotently next sync
  *    (EEXIST is success).
  *  - The mirror is metadata-scale: one log read + one link per new
  *    file. On an object store, "link" becomes a manifest entry; the
  *    file-source design is unchanged.
  *
  * Non-append commits follow Delta's streaming-source contract via
  * `onRewrite`: "fail" (default — a merge/delete/compact in the history
  * is an error, streams expect append-only), "ignore" (skip the commit
  * entirely; its adds carry rows that mostly duplicate removed files),
  * or "reemit" (link its added files too — at-least-once re-emission of
  * carried rows, Delta's ignoreChanges). The very first commit of a
  * table (version 1) is always streamed even though `overwrite` marks
  * it, so "load then tail" works naturally. */
object GraftLogStream {

  private val SyncMarker = "_sync.json"
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def io: TableIO = TableIO()

  private def syncedVersion(feedDir: String): Long = {
    val f = TableIO.join(feedDir, SyncMarker)
    if (!io.exists(f)) 0L
    else mapper.readTree(io.readString(f)).get("syncedVersion").asLong()
  }

  /** Advance the feed mirror to the current log head. Idempotent and
    * crash-safe: rerunning after any partial failure converges (links
    * that already exist are success; the marker is written atomically
    * after all links land). Returns the synced version. */
  def syncFeed(base: String, feedDir: String,
               onRewrite: String = "fail"): Long = {
    require(Set("fail", "ignore", "reemit").contains(onRewrite),
      s"onRewrite must be fail|ignore|reemit, got '$onRewrite'")
    io.mkdirs(feedDir)
    val from = syncedVersion(feedDir)
    val fresh = GraftLog.commits(base).filter(_.version > from)
    if (fresh.isEmpty) return from
    fresh.foreach { c =>
      // deletion-vector commits name no files but still retract rows —
      // they are non-append changes for an append-only stream consumer
      val isRewrite =
        (c.remove.nonEmpty || c.addDv.nonEmpty || c.removeDv.nonEmpty) &&
          c.version > 1
      val link: Boolean =
        if (!isRewrite) true
        else onRewrite match {
          case "fail" => throw new IllegalStateException(
            s"graft-log stream over $base hit non-append commit " +
              s"v${c.version} (${c.operation}); pass onRewrite=ignore|reemit")
          case "ignore" => false
          case "reemit" => true
        }
      if (link) c.add.foreach { name =>
        io.mirror(TableIO.join(base, name),
          TableIO.join(feedDir, f"v${c.version}%020d-$name"))
      }
    }
    val head = fresh.last.version
    val tmp = TableIO.join(feedDir, s".tmp_sync_${java.util.UUID.randomUUID()}")
    io.writeString(tmp, s"""{"syncedVersion":$head}""")
    io.moveReplace(tmp, TableIO.join(feedDir, SyncMarker))
    head
  }

  private val CdfMarker = "_cdf_sync.json"

  private def cdfSyncedVersion(feedDir: String): Long = {
    val f = TableIO.join(feedDir, CdfMarker)
    if (!io.exists(f)) 0L
    else mapper.readTree(io.readString(f)).get("syncedVersion").asLong()
  }

  /** Advance the CHANGE-FEED mirror: every commit links BOTH sides of
    * its file diff — added files under `v<version>-i-<name>`, removed
    * files under `v<version>-d-<name>`. The sign lives entirely in the
    * link name (zero copy, no rewrite); `tailChangeFeed` recovers it from
    * the file-metadata column. No onRewrite modes: a change feed is
    * defined for every commit kind. Removed files must still exist on
    * disk, so vacuum retention bounds the reachable history (Delta's
    * contract). Idempotent and crash-safe exactly like `syncFeed`. */
  def syncCdfFeed(base: String, feedDir: String): Long = {
    io.mkdirs(feedDir)
    val from = cdfSyncedVersion(feedDir)
    val fresh = GraftLog.commits(base).filter(_.version > from)
    if (fresh.isEmpty) return from
    fresh.foreach { c =>
      // A dv commit deletes ROWS, not files — a hard-link mirror has
      // nothing to link, and linking around it would silently corrupt
      // the feed's net effects (a later purge's remove side re-emits
      // rows the dv already deleted). Fail loudly; the batch
      // readChangeFeed handles dv histories exactly.
      if (c.addDv.nonEmpty || c.removeDv.nonEmpty)
        throw new IllegalStateException(
          s"cdf mirror cannot express deletion-vector commit " +
            s"v${c.version} (${c.operation}); purge deletes first " +
            "(GraftLog.purgeDeletes) or use batch GraftLog.readChangeFeed")
      def link(names: Seq[String], tag: String): Unit = names.foreach { name =>
        io.mirror(TableIO.join(base, name),
          TableIO.join(feedDir, f"v${c.version}%020d-$tag-$name"))
      }
      link(c.add, "i")
      link(c.remove, "d")
    }
    val head = fresh.last.version
    val tmp = TableIO.join(feedDir, s".tmp_cdf_${java.util.UUID.randomUUID()}")
    io.writeString(tmp, s"""{"syncedVersion":$head}""")
    io.moveReplace(tmp, TableIO.join(feedDir, CdfMarker))
    head
  }

  /** The change feed as a streaming DataFrame — Delta's
    * `readChangeFeed` streaming analogue, on the same checkpointed
    * parquet file stream as `tail` (exactly-once across restarts).
    * Appends `_change_type` (insert|delete) and `_commit_version`,
    * both decoded from the mirror link names via the file-metadata
    * column — a rewriting commit emits delete+insert pairs for carried
    * rows, so per-KEY net effects are exact, matching the batch
    * `GraftLog.readChangeFeed`. Re-call `syncCdfFeed` to surface
    * commits landing while the stream runs. */
  def tailChangeFeed(spark: SparkSession, base: String, feedDir: String,
                     options: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions._
    syncCdfFeed(base, feedDir)
    val snap = GraftLog.snapshot(base)
    val schema = snap.schemaJson.map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .getOrElse(spark.read.parquet(
        snap.files.map(f => s"$base/$f"): _*).schema)
    spark.readStream.schema(schema).options(options).parquet(feedDir)
      .select(col("*"), col("_metadata.file_name").as("__cdf_file"))
      .withColumn("_commit_version",
        regexp_extract(col("__cdf_file"), "^v(\\d{20})-", 1).cast("long"))
      .withColumn("_change_type",
        when(regexp_extract(col("__cdf_file"), "^v\\d{20}-(i|d)-", 1) === "d",
          lit("delete")).otherwise(lit("insert")))
      .drop("__cdf_file")
  }

  /** The table as a streaming DataFrame: one sync, then Spark's parquet
    * file stream over the mirror (schema pinned from the log, so
    * evolution-era files read missing columns as null). Re-call
    * `syncFeed` to surface commits that land while the stream runs —
    * each file-source micro-batch picks up whatever is linked by then.
    * `options` pass through to the reader (e.g. maxFilesPerTrigger for
    * batch-size control). */
  def tail(spark: SparkSession, base: String, feedDir: String,
           onRewrite: String = "fail",
           options: Map[String, String] = Map.empty): DataFrame = {
    syncFeed(base, feedDir, onRewrite)
    val snap = GraftLog.snapshot(base)
    val schema = snap.schemaJson.map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .getOrElse(spark.read.parquet(
        snap.files.map(f => s"$base/$f"): _*).schema)
    spark.readStream.schema(schema).options(options).parquet(feedDir)
  }
}
