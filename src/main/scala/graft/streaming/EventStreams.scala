package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming layer. The reference is batch-only (SURVEY.md
  * §2.8 — its "incremental" behavior is manually-triggered full-snapshot
  * overwrites), so this is a capability extension: the same event
  * semantics as the batch operators (windowed aggregation, gap
  * sessionization), expressed over an unbounded source with watermarks
  * and explicit state.
  *
  * Scale notes: state is keyed (event_type / user_id) and bounded by the
  * watermark — executors hold only open windows/sessions; nothing grows
  * with total history. File sources at 100 TB become Kafka topics with
  * the same plan shape.
  */
object EventStreams {

  /** Storage seam — all directory swaps, markers and checkpoint
    * cleanup go through it (same zero-`java.io.File` invariant as the
    * table-format layer). */
  private def io: graft.sources.TableIO = graft.sources.TableIO()

  /** The events table's schema as read by Tables.load (ts already micros). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * state (late rows beyond `lateness` are dropped, windows finalize). */
  def windowedTypeStats(events: DataFrame, windowLen: String = "1 hour",
                        lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Hopping (sliding) window counts/sums per event type: a window of
    * `windowLen` starts every `slide`, so each event belongs to
    * windowLen/slide overlapping windows. State per key is bounded by
    * the watermark exactly as in the tumbling case — the overlap factor
    * multiplies open-window state, not history. The smoothing view
    * (10-minute trend sampled every 5) a tumbling window can't express. */
  def hoppingTypeStats(events: DataFrame, windowLen: String = "10 minutes",
                       slide: String = "5 minutes",
                       lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Output row of [[UserTypeCountProcessor]]: the cumulative per-type
    * count for one user AFTER a micro-batch (event_type = "__all__" rows
    * carry the user's cumulative total across all types). */
  case class UserTypeCount(user_id: Long, event_type: String, n_events: Long)

  /** Arbitrary stateful processing via Spark 4's `transformWithState`
    * (the successor to flatMapGroupsWithState: typed state primitives —
    * ValueState / MapState / ListState — with per-state TTL and timers,
    * backed by RocksDB column families so each state variable is its own
    * sorted keyspace instead of one serialized blob per key).
    *
    * This processor keys by user and maintains TWO state variables:
    *  - `total`:   ValueState[Long]        — cumulative event count
    *  - `perType`: MapState[String, Long]  — cumulative count per type
    * After each input batch it emits the updated cumulative counts for
    * the types touched in that batch plus one "__all__" row. Emissions
    * are cumulative, so `max(n_events)` per (user, type) downstream is
    * the exact total REGARDLESS of how the replay was micro-batched —
    * the batch-invariance trick that makes an append-mode drain of a
    * running aggregate oracle-checkable.
    *
    * Scale: state is per-user and O(#distinct types); RocksDB keeps it
    * off-heap, so the operator survives key cardinalities that overflow
    * executor heap (where the in-memory HDFS-backed store would OOM).
    */
  class UserTypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTypeCount] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState, MapState}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var total: ValueState[Long] = _
    @transient private var perType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      total = getHandle.getValueState[Long]("total", E.scalaLong, TTLConfig.NONE)
      perType = getHandle.getMapState[String, Long](
        "perType", E.STRING, E.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[UserTypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet[String]()
      var n = 0L
      rows.foreach { e =>
        val c = if (perType.containsKey(e.event_type)) perType.getValue(e.event_type) else 0L
        perType.updateValue(e.event_type, c + 1L)
        touched += e.event_type
        n += 1L
      }
      val newTotal = (if (total.exists()) total.get() else 0L) + n
      total.update(newTotal)
      val out = touched.iterator.map(t => UserTypeCount(key, t, perType.getValue(t))) ++
        Iterator.single(UserTypeCount(key, "__all__", newTotal))
      out
    }
  }

  /** Per-user cumulative event counts (per type + "__all__" total) via
    * `transformWithState`. Returns the drained append-mode emissions;
    * collapse with `max(n_events)` per (user_id, event_type) for the
    * batch-equivalent exact counts. */
  def userTypeCountsTws(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val emitted = events.as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new UserTypeCountProcessor,
        TimeMode.None(), OutputMode.Append())
    drainAvailableNow(emitted.toDF(), mode = "append", forceRocksDb = true)
  }
  case class SessionState(sessionStartUs: Long, lastTsUs: Long, nEvents: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
                        session_end_us: Long, n_events: Long)

  /** Gap-based session assembly with explicit keyed state
    * (flatMapGroupsWithState): a session closes when no event arrives
    * within `gapMicros` (enforced via processing-time timeout in a live
    * stream; in replay, when a later event breaches the gap). Emits one
    * row per closed session. */
  def sessionizeStream(events: Dataset[Event], gapMicros: Long)
                      (implicit enc1: org.apache.spark.sql.Encoder[SessionOut])
  : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // Within a micro-batch rows are not ordered; sort this batch.
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(-1L, -1L, 0L))
          val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
          sorted.foreach { e =>
            val tsUs = e.ts.getTime * 1000L
            if (st.sessionStartUs < 0) {
              st = SessionState(tsUs, tsUs, 1L)
            } else if (tsUs - st.lastTsUs > gapMicros) {
              closed += SessionOut(userId, st.sessionStartUs, st.lastTsUs, st.nEvents)
              st = SessionState(tsUs, tsUs, 1L)
            } else {
              st = st.copy(lastTsUs = tsUs, nEvents = st.nEvents + 1)
            }
          }
          state.update(st)
          closed.iterator
      }
  }

  /** Stream-static join: enrich an unbounded stream with a bounded
    * dimension table. The static side is planned per micro-batch exactly
    * like a batch join (broadcast when small), and the stream side stays
    * stateless — the scale-out pattern for attaching reference data to a
    * 100 TB/day event firehose without any state store. */
  def streamStaticJoin(stream: DataFrame, dim: DataFrame,
                       keys: Seq[String]): DataFrame =
    stream.join(dim, keys)

  /** Streaming exact dedup on a key set: keeps the first-seen row per
    * key. Without a watermark the key state is unbounded (replay /
    * bounded-source semantics, matching a batch DISTINCT); production
    * streams bound it with `withWatermark` upstream so expired keys are
    * evicted (dropDuplicatesWithinWatermark semantics). */
  def dedupByKey(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.dropDuplicates(keys)

  /** Watermark-bounded streaming dedup: duplicates are only suppressed
    * within the watermark horizon, and key state older than the
    * watermark is EVICTED — the production form of streaming dedup whose
    * state stays O(keys-per-horizon) instead of O(all-keys-ever) on an
    * unbounded stream. `eventTimeCol` must be one of the dedup columns'
    * row's event-time column. */
  def dedupWithinWatermark(stream: DataFrame, keys: Seq[String],
                           eventTimeCol: String, lateness: String): DataFrame =
    stream.withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream inner join with an event-time band: pairs where
    * right.ts ∈ [left.ts − window, left.ts] on a shared key. Watermarks
    * on BOTH sides bound the join state (each side buffers only rows
    * young enough to still find a partner); inner-join matches emit as
    * soon as both rows arrive. The scale-out path for correlating two
    * unbounded firehoses (click↔view attribution) without a batch
    * re-join. The two sides' columns (keys included) must be disjointly
    * named — the condition references them unqualified. */
  def streamStreamBandJoin(left: DataFrame, right: DataFrame,
                           leftKey: String, rightKey: String,
                           leftTs: String, rightTs: String,
                           window: String, lateness: String = "1 hour"): DataFrame =
    left.withWatermark(leftTs, lateness)
      .join(right.withWatermark(rightTs, lateness),
        expr(s"""$leftKey = $rightKey AND
                 $rightTs >= $leftTs - INTERVAL $window AND
                 $rightTs <= $leftTs"""))

  private val drainRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Drain a (bounded-replay) streaming frame through Trigger.AvailableNow
    * into a uniquely-named memory sink and hand back the materialized
    * table. Checkpoints go to tmpfs: the state store's many small commit
    * files + fsyncs are kernel-bound in this VM (profiled: 33.8 s → ~4 s
    * for one AvailableNow batch at sf0.1 just by moving off disk). */
  def drainAvailableNow(df: DataFrame, mode: String = "complete",
                        statePartitions: Int = 8,
                        forceRocksDb: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val sink = s"graft_drain_${drainRuns.incrementAndGet()}"
    val ckpt = s"/dev/shm/graft_ckpt_$sink"
    // Stateful operators allocate one state store per shuffle partition,
    // and each store pays commit/snapshot overhead per micro-batch — at
    // a bounded replay's data volume 32 stores is pure fixed cost. The
    // conf is captured when the query STARTS, so set-and-restore is safe
    // for this session's later batch queries.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.get(provKey, "")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      // Optional RocksDB state store (rocksdbjni ships with Spark here).
      // Measured on this VM (sf0.1, 3 reps each, q50/q64/q80): RocksDB is
      // uniformly SLOWER than the default in-memory HDFS-backed store for
      // these bounded replays (native column-family setup per store ×
      // partitions × micro-batches dominates; state fits in heap easily).
      // It's the right store when state EXCEEDS heap — so it stays one
      // env flip away instead of the default.
      // transformWithState queries REQUIRE RocksDB (the only provider
      // implementing the multi-column-family state layout it needs), so
      // callers draining one pass forceRocksDb regardless of the env flip.
      if (forceRocksDb || sys.env.get("SPARK_GRAFT_STATESTORE").contains("rocksdb"))
        spark.conf.set(provKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      df.writeStream.format("memory").queryName(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      if (prevProv.isEmpty) spark.conf.unset(provKey)
      else spark.conf.set(provKey, prevProv)
      io.deleteRecursively(ckpt)
    }
    spark.table(sink)
  }

  /** Micro-batch parquet ingestion via foreachBatch: each batch appends
    * atomically, giving an incremental bronze layer driven by the
    * streaming engine's own progress tracking (checkpointed offsets =
    * exactly-once file-level ingestion). The streaming counterpart of
    * the reference's overwrite-everything bronze jobs
    * (spark/jobs/bronze_ingestion.py:32-34). */
  def streamIngestParquet(stream: DataFrame, path: String): Unit = {
    val ckpt = s"/dev/shm/graft_ingest_ckpt_${java.util.UUID.randomUUID()}"
    try {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(path)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    } finally {
      io.deleteRecursively(ckpt)
    }
  }

  /** Micro-batch ingestion into a graft-log TABLE: each batch lands as
    * one atomic graft-log append whose txnId is (checkpoint, batchId) —
    * so a batch replayed after a crash between the table commit and the
    * offset commit is recognized and skipped by the log itself
    * (`GraftLog.commit` txn idempotence). This is the exactly-once
    * streaming sink the plain-parquet `streamIngestParquet` can only
    * approximate (an append-mode parquet write is not atomic and not
    * replay-proof): end-to-end = checkpointed offsets + transactional,
    * idempotent table commits. Readers always see a consistent snapshot;
    * time travel works per micro-batch. */
  def streamIngestGraftLog(stream: DataFrame, base: String,
                           checkpoint: Option[String] = None): Unit = {
    val ephemeral = checkpoint.isEmpty
    val ckpt = checkpoint.getOrElse(
      s"/dev/shm/graft_loggest_ckpt_${java.util.UUID.randomUUID()}")
    try {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.pipeline.GraftLog.append(batch, base,
            txnId = Some(s"$ckpt#$batchId"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    } finally {
      if (ephemeral)
        io.deleteRecursively(ckpt)
    }
  }

  /** Micro-batch ingestion into a DELTA table — the open-format
    * exactly-once streaming sink: each batch lands as ONE
    * `DeltaInterop.appendIdempotent` commit whose `txn` action is
    * (appId, batchId), so a batch replayed after a crash between the
    * Delta commit and the streaming offset commit is recognized by the
    * table itself and skipped (protocol §Transaction Identifiers — the
    * same design as delta-spark's own streaming sink). The table is
    * created by the first batch; any OSS Delta reader can tail it.
    * `appId` defaults to the checkpoint path, the identity a restarted
    * query keeps. */
  def streamIngestDelta(stream: DataFrame, base: String,
                        appId: Option[String] = None,
                        checkpoint: Option[String] = None): Unit = {
    val ephemeral = checkpoint.isEmpty
    val ckpt = checkpoint.getOrElse(
      s"/dev/shm/graft_delta_ckpt_${java.util.UUID.randomUUID()}")
    val app = appId.getOrElse(ckpt)
    try {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.DeltaInterop.appendIdempotent(
            batch, base, app, batchId)
          // micro-batches commit off the SQL-statement thread, so the
          // UniForm mirror of a streaming target catches up here —
          // per batch, not per statement (a no-op for plain tables)
          graft.sources.Uniform.tickTouched(batch.sparkSession)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    } finally {
      if (ephemeral)
        io.deleteRecursively(ckpt)
    }
  }

  /** Micro-batch ingestion into an ICEBERG table — the third leg of the
    * exactly-once sink triangle (graft-log txns, Delta txn identifiers):
    * each batch lands as ONE `IcebergInterop.appendIdempotent` snapshot
    * whose summary records (graft.app-id, graft.batch-id), so a batch
    * replayed after a crash between the table commit and the streaming
    * offset commit is recognized from the snapshot history and skipped.
    * The table is created by the first batch; any Iceberg reader can
    * tail it (and `rewriteDataFiles` folds the per-batch small files).
    * `appId` defaults to the checkpoint path, the identity a restarted
    * query keeps. */
  def streamIngestIceberg(stream: DataFrame, base: String,
                          appId: Option[String] = None,
                          checkpoint: Option[String] = None,
                          formatVersion: Int = 2): Unit = {
    val ephemeral = checkpoint.isEmpty
    val ckpt = checkpoint.getOrElse(
      s"/dev/shm/graft_ice_ckpt_${java.util.UUID.randomUUID()}")
    val app = appId.getOrElse(ckpt)
    try {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.IcebergInterop.appendIdempotent(
            batch, base, app, batchId, formatVersion = formatVersion)
          // micro-batches commit off the SQL-statement thread, so a
          // DELTA mirror of a streaming Iceberg target catches up here
          // — per batch, not per statement (a no-op for plain tables);
          // symmetric with streamIngestDelta's UniForm tick
          graft.sources.DeltaMirror.tickTouched(batch.sparkSession)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    } finally {
      if (ephemeral)
        io.deleteRecursively(ckpt)
    }
  }

  /** Micro-batch CDC MERGE into a graft-log table: each batch UPSERTS by
    * `key` via the partition-scoped merge (`GraftLog.upsertScoped` — only
    * files whose zone-map range holds a batch key rewrite), with
    * txnId = (checkpoint, batchId) so a batch replayed after a crash
    * between the table commit and the offset commit is recognized and
    * skipped. This is the incremental-CDC sink shape at 100 TB: a
    * clustered table absorbs a localized update stream by rewriting a
    * handful of files per batch, exactly once.
    *
    * With `seqCol`, multiple updates for one key WITHIN a batch collapse
    * to the highest-sequence row first (CDC streams deliver ordered
    * changes; a MERGE source must be key-unique). Without it, the caller
    * guarantees per-batch key uniqueness. */
  def streamMergeGraftLog(stream: DataFrame, base: String, key: String,
                          seqCol: Option[String] = None,
                          checkpoint: Option[String] = None): Unit = {
    val ephemeral = checkpoint.isEmpty
    val ckpt = checkpoint.getOrElse(
      s"/dev/shm/graft_logmerge_ckpt_${java.util.UUID.randomUUID()}")
    try {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val unique = seqCol match {
            case Some(sc) =>
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col(key)).orderBy(col(sc).desc)
              batch.withColumn("__rn", row_number().over(w))
                .filter(col("__rn") === 1).drop("__rn")
            case None => batch
          }
          graft.pipeline.GraftLog.upsertScoped(batch.sparkSession, base,
            unique, key, txnId = Some(s"$ckpt#$batchId"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    } finally {
      if (ephemeral)
        io.deleteRecursively(ckpt)
    }
  }

  /** Incrementally-maintained gold aggregate via foreachBatch: each
    * micro-batch computes a partial (count, exact-decimal sum) per key
    * and merges it into the running gold table by union + re-aggregation
    * of partials — the algebraic-aggregate merge that makes the gold
    * table cost O(batch + |keys|) per batch instead of O(history).
    *
    * Exactly-once across restarts requires BOTH a stable caller-supplied
    * `checkpoint` (so offsets survive) AND an idempotent merge — the
    * merge here records the last-merged batchId in a `_graft_batchid`
    * marker that commits atomically WITH the gold snapshot (same
    * directory rename), so a batch replayed after a crash between the
    * gold swap and the offset commit is detected and skipped instead of
    * double-counted. With the default ephemeral checkpoint the sink is
    * only exactly-once within a single invocation against a fresh gold
    * dir. The swap itself is rename(gold→old) + rename(staging→gold) +
    * delete(old); a crash between the two renames is repaired at the
    * next batch start by restoring `old`. At 100 TB the gold table is
    * partitioned and only touched keys' partitions rewrite. */
  def streamIncrementalGold(stream: DataFrame, key: String, valueCol: String,
                            goldPath: String,
                            checkpoint: Option[String] = None): Unit = {
    val ephemeral = checkpoint.isEmpty
    val ckpt = checkpoint.getOrElse(
      s"/dev/shm/graft_gold_ckpt_${java.util.UUID.randomUUID()}")
    try {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val spark = batch.sparkSession
          val oldPath = goldPath + "__old"
          // crash repair: swap died between renames → previous snapshot
          // is intact under __old; restore it before merging.
          if (!io.exists(goldPath) && io.exists(oldPath))
            io.move(oldPath, goldPath)
          // The marker is scoped to the CHECKPOINT identity: batchIds
          // restart at 0 for every new query, so a fresh invocation (new
          // checkpoint) merging into an existing gold table must not be
          // mistaken for a replay — only the same checkpoint re-delivering
          // an already-merged batchId is.
          val ckptId = ckpt
          val marker = graft.sources.TableIO.join(goldPath, "_graft_batchid")
          val lastMerged =
            if (io.exists(marker)) {
              val Array(storedCkpt, storedBatch) =
                io.readString(marker).trim.split('\n').padTo(2, "-1")
              if (storedCkpt == ckptId) storedBatch.trim.toLong else -1L
            } else -1L
          if (batchId <= lastMerged) {
            // replay of an already-merged batch (crash landed between the
            // gold swap and the offset commit) — idempotent skip
            System.err.println(
              s"[gold] batch $batchId already merged (last=$lastMerged); skipping")
          } else {
            val partial = batch.groupBy(col(key))
              .agg(
                count(lit(1)).as("n_events"),
                sum(col(valueCol).cast(DecimalType(18, 2))).as("sum_value_dec"))
            val merged =
              (if (io.exists(goldPath))
                 spark.read.parquet(goldPath)
                   .select(col(key), col("n_events"),
                     col("sum_value_dec").cast(DecimalType(38, 2)).as("sum_value_dec"))
                   .unionByName(partial.select(col(key), col("n_events"),
                     col("sum_value_dec").cast(DecimalType(38, 2)).as("sum_value_dec")))
               else partial)
                .groupBy(col(key))
                .agg(
                  sum(col("n_events")).as("n_events"),
                  sum(col("sum_value_dec")).cast(DecimalType(38, 2)).as("sum_value_dec"))
            val staging = goldPath + "__staging"
            merged.write.mode("overwrite").parquet(staging)
            // marker commits atomically with the snapshot (same rename);
            // underscore-prefixed files are invisible to parquet readers
            io.writeString(
              graft.sources.TableIO.join(staging, "_graft_batchid"),
              s"$ckptId\n$batchId")
            io.deleteRecursively(oldPath)
            if (io.exists(goldPath)) io.move(goldPath, oldPath)
            io.move(staging, goldPath)
            io.deleteRecursively(oldPath)
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    } finally {
      if (ephemeral)
        io.deleteRecursively(ckpt)
    }
  }

  /** Wire a parquet directory as a (replayed) stream with the events
    * schema — lets batch fixtures drive the streaming operators.
    *
    * FileStreamSource needs a user-declared schema, and declaring a WRONG
    * physical type is the one failure an engine must never have: when the
    * testdata drifted from TIMESTAMP(NANOS)-as-int64 to native
    * timestamp[us], a hard-coded `ts: LongType` schema silently read the
    * micros as "nanos" and shipped timestamps 1000× too small with a
    * clean schema. So: sniff the batch footer of the SAME path first,
    * declare the physical type the file actually has, convert by that
    * type, and fail loudly (epoch-range assert) if the result is outside
    * any plausible event-time range. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    // nanos readability comes from Tables.withTestdataConfs, applied at
    // session construction — no conf mutation here
    val path = s"$dir/events.parquet"
    // One footer read — metadata-only, no data scan.
    val physical = spark.read.parquet(path).schema("ts").dataType
    val streamSchema = StructType(eventSchema.fields.map {
      case f if f.name == "ts" => StructField("ts", physical)
      case f => f
    })
    // Two on-disk shapes serve the same table: the driver's testdata is
    // a SINGLE FILE named events.parquet (stream the parent dir with a
    // glob, since FileStreamSource requires a directory), while any
    // Spark-written copy (ScaleTestdata, a real deployment) is a
    // DIRECTORY of part files (stream it directly — the glob would
    // match no leaf and silently yield an empty stream).
    val raw =
      if (graft.sources.TableIO().isDirectory(path))
        spark.readStream.schema(streamSchema).parquet(path)
      else
        spark.readStream.schema(streamSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir)
    val converted = physical match {
      case LongType          => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType     => raw
      case TimestampNTZType  => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other in $path — extend readEventStream")
    }
    assertEventTimesSane(spark, path, physical)
    converted
  }

  /** Loud guard against silent timestamp corruption: apply the same
    * conversion the stream will apply and assert min/max land in a
    * plausible event-time range. A future encoding drift (e.g. int64
    * micros read as "nanos" → 1000× shrink to ~1970) throws here instead
    * of shipping wrong windows.
    *
    * O(metadata), not O(data): the min/max come from the parquet FOOTER
    * row-group statistics (every int64 ts encoding the testdata has ever
    * shipped carries them), so at 100 TB the guard reads footers, never
    * data pages, and fires no Spark job. Files without usable ts stats
    * (e.g. INT96) fall back to one column-pruned min/max scan — correct
    * either way, just not free. */
  private def assertEventTimesSane(spark: SparkSession, path: String,
                                   physical: org.apache.spark.sql.types.DataType): Unit = {
    // raw footer int64 → epoch micros, mirroring the stream's conversion
    val toMicros: Long => Long = physical match {
      case LongType => _ / 1000L // int64 nanos encoding
      case _        => identity  // TIMESTAMP(MICROS) instant / NTZ
    }
    footerTsMinMax(spark, path).map { case (rawMn, rawMx) =>
      (new Timestamp(toMicros(rawMn) / 1000L), new Timestamp(toMicros(rawMx) / 1000L))
    }.orElse {
      // fallback: stats unavailable — one column-pruned min/max scan
      val ts = physical match {
        case LongType         => expr("timestamp_micros(ts div 1000)")
        case TimestampNTZType => col("ts").cast(TimestampType)
        case _                => col("ts")
      }
      val row = spark.read.parquet(path).select(min(ts), max(ts)).head()
      if (row.isNullAt(0)) None else Some((row.getTimestamp(0), row.getTimestamp(1)))
    } match {
      case None => // zero rows — nothing to corrupt
      case Some((mn, mx)) =>
        val lo = Timestamp.valueOf("1990-01-01 00:00:00")
        val hi = Timestamp.valueOf("2100-01-01 00:00:00")
        require(!mn.before(lo) && !mx.after(hi),
          s"events.ts sanity check failed: min=$mn max=$mx outside [$lo,$hi] — " +
          s"physical type $physical is being decoded wrongly (testdata encoding drift?)")
    }
  }

  /** Footer-stats [min,max] of the raw int64 `ts` column across all part
    * files under `path`, or None if any row group lacks usable stats.
    * Driver-side footer reads only. */
  private def footerTsMinMax(spark: SparkSession, path: String): Option[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val hconf = spark.sessionState.newHadoopConf()
    val parts: Seq[String] =
      if (io.isDirectory(path))
        io.list(path)
          .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
          .map(n => graft.sources.TableIO.join(path, n))
      else Seq(path)
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var rows = 0L
    val ok = parts.forall { file =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), hconf))
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.forall { block =>
          rows += block.getRowCount
          block.getColumns.asScala.filter(_.getPath.toDotString == "ts").forall { c =>
            val st = c.getStatistics
            // INT96 / stats-less writers: genericGetMin is not a Long
            st != null && !st.isEmpty && st.hasNonNullValue &&
              (st.genericGetMin match {
                case v: java.lang.Long =>
                  mn = math.min(mn, v); mx = math.max(mx, st.genericGetMax.asInstanceOf[java.lang.Long]); true
                case _ => false
              })
          }
        }
      } finally reader.close()
    }
    // no usable stats, or zero non-null values (rows==0 ⇒ no blocks):
    // None → caller's scan fallback, which handles empty data itself
    if (!ok || rows == 0 || mn > mx) None
    else Some((mn, mx))
  }
}
