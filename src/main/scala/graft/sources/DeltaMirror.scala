package graft.sources

import org.apache.spark.sql.SparkSession

/** Delta mirror of an Iceberg-primary table — UniForm reversed (the
  * shape Apache XTable maintains): `_delta_log/` beside the Iceberg
  * `metadata/` under ONE base, over the same data files, so Delta
  * readers see every Iceberg commit zero-copy. Iceberg stays the
  * writable primary; the Delta side is read-only (every Delta commit
  * path refuses via the marker beside the log).
  *
  * Maintenance mirrors [[Uniform]]'s: every Iceberg metadata publish
  * marks its base dirty and the SQL front-end drains the set after
  * each statement; programmatic writers call [[sync]] themselves. The
  * sync is convergent (always republishes the Iceberg head), so a late
  * tick lags but never loses state. `expireSnapshots` pre-syncs so the
  * mirror never references a file expiry is about to delete. */
object DeltaMirror {
  /** Publish (first call) or catch up the Delta mirror at `base`.
    * Returns the mirror's Delta version. */
  def sync(spark: SparkSession, base: String): Long =
    DeltaInterop.syncMirrorFromIceberg(spark, base)

  /** Alias for the first [[sync]] — reads as intent at call sites. */
  def enable(spark: SparkSession, base: String): Long = sync(spark, base)

  /** True iff `base` carries a mirror-managed Delta log. */
  def isMirror(base: String): Boolean = DeltaInterop.isIcebergMirror(base)

  private val dirty =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val syncErrors =
    new java.util.concurrent.ConcurrentHashMap[String, Throwable]()

  private[sources] def markDirty(base: String): Unit =
    dirty.add(PathCodec.absNorm(base))

  /** The last drain-time sync failure for `base`, if the mirror lags
    * because of one (cleared by the next successful sync). */
  def lastSyncError(base: String): Option[Throwable] =
    Option(syncErrors.get(PathCodec.absNorm(base)))

  /** Drain the dirty set: one marker probe per base that committed
    * since the last drain; mirrors sync, everything else is skipped.
    * Failures are recorded and logged, never thrown — the Iceberg
    * commit they mirror already succeeded; [[sync]] is the loud path. */
  def tickTouched(spark: SparkSession): Unit = {
    val it = dirty.iterator()
    while (it.hasNext) {
      val base = it.next(); it.remove()
      try {
        if (DeltaInterop.isIcebergMirror(base)) {
          DeltaInterop.syncMirrorFromIceberg(spark, base)
          syncErrors.remove(base)
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          syncErrors.put(base, e)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"Delta mirror sync of $base failed (the Iceberg commit is " +
            s"durable; the mirror lags until a successful sync): " +
            s"${e.getMessage}")
      }
    }
  }
}
