package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained materialized aggregate view over a graft-log
  * table — the CONSUMER side of the change feed (Delta's "incremental ETL
  * with CDF" pattern; the reference's gold tables recompute from silver on
  * every run, e.g. `/root/reference/spark/gold_aggregation.py` — at 100 TB
  * that full rescan is exactly what this module removes).
  *
  * The view is a grouped aggregate (`keys` → row count + exact decimal sums)
  * stored as a graft-log table of its own, so refreshes are atomic commits
  * with time travel and history for free. Each refresh commit carries
  * txnId `ivm@<baseVersion>`, making the view's log a durable record of
  * WHICH base snapshot it reflects:
  *
  *  - first refresh = full build from the base snapshot (one scan, ever);
  *  - later refreshes read ONLY the change feed of the commits since the
  *    last applied base version (metadata-scale planning: just the files
  *    those commits added/removed), fold the signed per-key deltas, and
  *    merge them into the current state with one key full-outer join.
  *    Count and sum are abelian-group aggregates, so carried-over rows of
  *    rewriting commits (delete+insert pairs in the feed) cancel exactly
  *    and the fold equals a recompute — bit-exact, because the sums stay
  *    in decimal until read time.
  *
  * Scale shape: the expensive inputs are the changed files only; the state
  * side is one row per group (bounded by key cardinality, not table size);
  * the merge is one shuffle on the group keys. A refresh after appending
  * 1 GB to a 100 TB base costs ~1 GB of read, not 100 TB.
  *
  * Crash-safety and concurrency: a refresh that computed against base
  * version V publishes with txnId `ivm@V` and expectedVersion = the view
  * head it merged from. A replayed refresh (same V) is a no-op returning
  * the original commit; a racing refresh loses the OCC check and
  * recomputes from the fresh view state. Zero-count groups are dropped on
  * merge; sums use "empty/all-null = 0" semantics (never null) so the
  * folded state is closed under the group operation.
  */
object IncrementalView {

  private val TxnPrefix = "ivm@"
  /** Fixed storage type for sums: stable across refreshes (Spark widens
    * decimal sums per plan, which would otherwise drift the view schema
    * commit to commit) and wide enough to never overflow a fold. */
  private val SumType = DecimalType(38, 6)

  /** Base-table version the view currently reflects (None = not built). */
  def lastAppliedVersion(viewPath: String): Option[Long] =
    GraftLog.commits(viewPath).reverse.iterator
      .flatMap(_.txnId)
      .collectFirst { case t if t.startsWith(TxnPrefix) =>
        t.stripPrefix(TxnPrefix).toLong }

  /** Bring the view up to the base head. Returns the base version the
    * view now reflects. No-op (no commit) when already current. */
  def refreshAggregate(spark: SparkSession, basePath: String,
                       viewPath: String, keys: Seq[String],
                       sumCols: Seq[String], maxRetries: Int = 5): Long = {
    require(keys.nonEmpty, "incremental view needs at least one group key")
    val baseHead = GraftLog.currentVersion(basePath).getOrElse(
      throw new IllegalArgumentException(s"no graft-log table at $basePath"))
    var attempt = 0
    while (true) {
      try return refreshOnce(spark, basePath, viewPath, keys, sumCols, baseHead)
      catch {
        // a concurrent refresh moved the view head between our read and
        // commit — recompute against the new state and try again
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  private def refreshOnce(spark: SparkSession, basePath: String,
                          viewPath: String, keys: Seq[String],
                          sumCols: Seq[String], baseHead: Long): Long = {
    val applied = lastAppliedVersion(viewPath)
    applied match {
      case Some(v) if v >= baseHead => baseHead // already current
      case None =>
        publish(fullState(GraftLog.read(spark, basePath, Some(baseHead)),
          keys, sumCols), viewPath, baseHead,
          expectedViewVersion = GraftLog.currentVersion(viewPath).getOrElse(0L))
        baseHead
      case Some(v) =>
        val viewHead = GraftLog.currentVersion(viewPath).getOrElse(0L)
        val state = GraftLog.read(spark, viewPath)
        val feed = GraftLog.readChangeFeed(spark, basePath, v + 1, Some(baseHead))
        val sign = when(col("_change_type") === "insert", lit(1L))
          .otherwise(lit(-1L))
        val deltas = feed.groupBy(keys.map(col): _*).agg(
          sum(sign).as("__d_cnt"),
          sumCols.map(c => coalesce(sum(col(c).cast(SumType) * sign),
            lit(0).cast(SumType)).as(s"__d_$c")): _*)
        // null-safe key join: a null group key is one group, not a miss
        val cond = keys.map(k => state(k) <=> deltas(k)).reduce(_ && _)
        val merged = state.join(deltas, cond, "full_outer")
          .select(
            keys.map(k => coalesce(state(k), deltas(k)).as(k)) ++
              Seq((coalesce(state("n_rows"), lit(0L)) +
                coalesce(col("__d_cnt"), lit(0L))).as("n_rows")) ++
              sumCols.map(c =>
                (coalesce(state(s"sum_$c"), lit(0).cast(SumType)) +
                  coalesce(col(s"__d_$c"), lit(0).cast(SumType)))
                  .cast(SumType).as(s"sum_$c")): _*)
          .filter(col("n_rows") > 0)
        publish(merged, viewPath, baseHead, expectedViewVersion = viewHead)
        baseHead
    }
  }

  /** One-scan full aggregate in the view's storage schema. */
  private def fullState(base: DataFrame, keys: Seq[String],
                        sumCols: Seq[String]): DataFrame =
    base.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sumCols.map(c => coalesce(sum(col(c).cast(SumType)),
        lit(0).cast(SumType)).cast(SumType).as(s"sum_$c")): _*)

  /** Atomic create-or-replace of the view state, stamped with the base
    * version it reflects. txnId makes a crash-replay of the same refresh
    * a no-op; expectedVersion makes a concurrent refresh a conflict. */
  private def publish(state: DataFrame, viewPath: String, baseVersion: Long,
                      expectedViewVersion: Long): Long = {
    val staged = GraftLog.stageFiles(state, viewPath)
    val prev =
      if (expectedViewVersion > 0) GraftLog.snapshot(viewPath).files
      else Seq.empty
    GraftLog.commit(viewPath, "ivm-refresh", staged, prev,
      txnId = Some(TxnPrefix + baseVersion),
      schemaJson = Some(state.schema.json),
      expectedVersion = Some(expectedViewVersion))
  }
}
