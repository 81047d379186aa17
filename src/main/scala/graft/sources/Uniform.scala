package graft.sources

import org.apache.spark.sql.SparkSession

/** Delta Universal Format ("UniForm" — the public
  * `delta.universalFormat.enabledFormats` contract, delta.io docs;
  * reference deployment context: the lakehouse stores every layer as
  * open-format tables on object storage, data-lakehouse-project
  * terraform/main.tf:41-59): a Delta table that ALSO maintains Iceberg
  * metadata over the same data files, so an Iceberg reader sees every
  * Delta commit without copying a byte. Delta stays the writable
  * primary; the Iceberg side is a read-only mirror.
  *
  * Layout matches delta-spark's UniForm: `_delta_log/` (the truth) and
  * `metadata/` (the Iceberg mirror) side by side under one base, data
  * files shared. The mirror is maintained at the STATEMENT layer — the
  * same place delta-spark runs its IcebergConverter hook: every Delta
  * commit marks its base dirty and the SQL front-end drains the set
  * after each statement. Programmatic writers either call [[sync]]
  * themselves or rely on the next statement's drain — the sync is
  * convergent (it always republishes Delta HEAD), so a late tick never
  * loses state, it just lags.
  */
object Uniform {
  /** The public Delta table property that switches UniForm on. */
  val PropKey = "delta.universalFormat.enabledFormats"

  /** Iceberg table property carrying the mirrored Delta version. Its
    * presence is also what marks the metadata as a managed mirror —
    * read-only on the Iceberg side (both Iceberg commit paths refuse
    * when they see it). */
  val TrackKey = "graft.uniform.delta-version"

  private[sources] def enabledFormats(
      snap: DeltaInterop.DeltaSnapshot): Seq[String] =
    snap.configuration.get(PropKey).toSeq
      .flatMap(_.split(",")).map(_.trim.toLowerCase).filter(_.nonEmpty)

  /** True iff the snapshot's properties request an Iceberg mirror. */
  def isEnabled(snap: DeltaInterop.DeltaSnapshot): Boolean =
    enabledFormats(snap).contains("iceberg")

  /** Switch UniForm on (records the public property if absent) and
    * publish the initial mirror. Returns the Iceberg snapshot id. */
  def enable(spark: SparkSession, base: String): Long = {
    val snap = DeltaInterop.snapshot(spark, base)
    if (!isEnabled(snap))
      DeltaInterop.setProperties(spark, base, Map(PropKey -> "iceberg"))
    sync(spark, base)
  }

  /** Catch the mirror up to Delta HEAD (no-op when already current).
    * Returns the current Iceberg snapshot id. */
  def sync(spark: SparkSession, base: String): Long =
    IcebergInterop.syncUniformFromDelta(spark, base)

  // ---- statement-layer post-commit hook ----------------------------
  // Bases with a Delta commit since the last drain. A global set (not
  // a ThreadLocal): streaming micro-batches and fixture threads commit
  // off the SQL thread, and their mirrors catch up on the next drain
  // from any thread.
  private val dirty =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // last Delta version already examined per base — makes the drain a
  // cheap no-op for the common case (tables that are not
  // uniform-enabled get one log-replay per new version, never a sync)
  private val seen =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  // cached enablement per base: only a metaData-carrying commit can
  // flip the property, so plain data commits on a known-not-uniform
  // table drain with ZERO I/O (a full log replay per statement per
  // committed table measurably taxed the bench's DML fixtures)
  private val enabledCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[sources] def markDirty(base: String,
                                 metaChanged: Boolean = true): Unit = {
    val key = PathCodec.absNorm(base)
    if (metaChanged) enabledCache.remove(key)
    dirty.add(key)
  }

  // last sync failure per base — the drain must NOT fail the
  // statement that triggered it (the Delta commit is already durable;
  // UniForm conversion is asynchronous by contract, delta-spark logs
  // its IcebergConverter failures the same way), but it must not be
  // silent either
  private val syncErrors =
    new java.util.concurrent.ConcurrentHashMap[String, Throwable]()

  /** The last drain-time sync failure for `base`, if the mirror is
    * lagging because of one (cleared by the next successful sync). */
  def lastSyncError(base: String): Option[Throwable] =
    Option(syncErrors.get(PathCodec.absNorm(base)))

  /** Drain the dirty set: for each base whose Delta version moved
    * since the last look, re-read the snapshot and sync when
    * uniform-enabled. O(bases committed since the last drain). A
    * failing sync is recorded and logged, never thrown — the Delta
    * commit it mirrors already succeeded; [[sync]] is the loud path. */
  def tickTouched(spark: SparkSession): Unit = {
    val it = dirty.iterator()
    while (it.hasNext) {
      val base = it.next(); it.remove()
      try {
        val known = enabledCache.get(base)
        if (known == null || known.booleanValue) {
          val head = DeltaInterop.currentVersion(base).getOrElse(-1L)
          val last = seen.get(base)
          if (head >= 0 && (last == null || last.longValue != head)) {
            val snap = DeltaInterop.snapshot(spark, base)
            val on = isEnabled(snap)
            enabledCache.put(base, java.lang.Boolean.valueOf(on))
            if (on)
              IcebergInterop.syncUniformFromDelta(spark, base, Some(snap))
            seen.put(base, snap.version)
            syncErrors.remove(base)
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          syncErrors.put(base, e)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"UniForm mirror sync of $base failed (the Delta commit is " +
            s"durable; the mirror lags until a successful sync): " +
            s"${e.getMessage}")
      }
    }
  }
}
