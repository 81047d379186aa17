package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's medallion architecture (Bronze → Silver → Gold over
  * parquet layers + catalog registration), as composable stages. Each
  * stage is a pure DataFrame function; sinks (SURVEY.md §2.2 K1–K7) live
  * in `write*`/`registerExternal`.
  *
  * The session catalog's `CREATE TABLE ... USING PARQUET LOCATION` stands
  * in for AWS Glue — the reference's own fallback path
  * (spark/jobs/mysql_gold_aggregation.py:168-176).
  */
object Medallion {

  // ------------------------------------------------------------- stages

  /** Bronze: raw + ingestion audit columns (reference:
    * spark/jobs/mysql_bronze_ingestion.py:85-88). `ingestionTs` is
    * injectable so pipelines stay deterministic/testable — the
    * reference's bare current_timestamp() cannot be oracle-checked. */
  def toBronze(raw: DataFrame, sourceSystem: String, sourceTable: String,
               ingestionTs: Column = current_timestamp()): DataFrame =
    raw
      .withColumn("ingestion_timestamp", ingestionTs)
      .withColumn("source_system", lit(sourceSystem))
      .withColumn("source_table", lit(sourceTable))

  /** Silver: cast money columns to decimal(10,2), date columns to date,
    * drop rows with nulls in required columns, add audit metadata
    * (reference: spark/jobs/mysql_silver_transformation.py:59-67). */
  def toSilver(bronze: DataFrame,
               moneyCols: Seq[String] = Seq.empty,
               dateCols: Seq[String] = Seq.empty,
               lowercaseCols: Seq[String] = Seq.empty,
               requiredCols: Seq[String] = Seq.empty,
               transformTs: Column = current_timestamp()): DataFrame = {
    val cast1 = moneyCols.foldLeft(bronze)((df, c) =>
      df.withColumn(c, col(c).cast(DecimalType(10, 2))))
    val cast2 = dateCols.foldLeft(cast1)((df, c) =>
      df.withColumn(c, col(c).cast("date")))
    val cast3 = lowercaseCols.foldLeft(cast2)((df, c) =>
      df.withColumn(c, lower(col(c))))
    val cleaned =
      if (requiredCols.nonEmpty) cast3.na.drop(requiredCols) else cast3
    cleaned
      .withColumn("transformation_timestamp", transformTs)
      .withColumn("data_quality_check",
        lit("passed")) // reference parity: a placeholder audit column
  }

  /** Gold: grouped aggregation with pinned output types (reference:
    * spark/jobs/gold_aggregation.py:97-104). */
  def toGold(silver: DataFrame, groupKeys: Seq[Column],
             aggs: Seq[Column]): DataFrame =
    silver.groupBy(groupKeys: _*).agg(aggs.head, aggs.tail: _*)

  /** Key-based upsert (MERGE): `updates` rows replace same-key `base`
    * rows; new keys append. The incremental-CDC primitive the
    * reference's overwrite-everything pipelines lack (every reference
    * write is mode("overwrite") — spark/jobs/bronze_ingestion.py:32-34
    * et al.). One anti-join + union, both sides partition-parallel; at
    * 100 TB pair with partition pruning so only touched partitions
    * rewrite (Delta/Iceberg MERGE INTO semantics on plain parquet). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates.select(base.columns.map(col): _*))
  // NOTE: `GraftLog.upsert` is the TRANSACTIONAL form of this operator —
  // same MERGE semantics, committed atomically to a graft-log table with
  // snapshot isolation. This DataFrame-in/DataFrame-out version stays for
  // pipelines that manage their own write.

  /** SCD Type-2 from a change history: collapse each key's timeline to
    * its attribute-change points and emit one row per version with
    * [valid_from, valid_to) bounds; the open version has valid_to NULL
    * and is_current = true. Two window passes over ONE hash partitioning
    * on the key (change detection via lag, interval close via lead) — a
    * single shuffle at any scale, no self-join. `attrs` are the tracked
    * attribute columns; ties on ts break on `tiebreak` for determinism. */
  def scd2FromHistory(history: DataFrame, keys: Seq[String], ts: String,
                      tiebreak: String, attrs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(ts), col(tiebreak))
    val attrStruct = struct(attrs.map(col): _*)
    val changed = history
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= attrStruct)
      .drop("__prev")
    val w2 = Window.partitionBy(keyCols: _*).orderBy(col(ts), col(tiebreak))
    changed
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** SCD Type-2 merge step (the operational counterpart of
    * `scd2FromHistory`): close the affected current versions and append
    * the new ones. `updates` carries the same key/attr columns plus an
    * `effectiveTs` column. Only keys present in `updates` are touched;
    * unchanged updates (same attrs as the current version) are no-ops.
    * A batch may carry several updates for one key: only the LATEST by
    * effectiveTs is applied (one new version per key per batch — apply
    * intermediate versions via `scd2FromHistory` if the full intra-batch
    * timeline matters); without this collapse the closed-row join would
    * multiply rows and emit several is_current=true versions per key.
    * Anti-join + union — partition-parallel, no driver loop. */
  def scd2Apply(dim: DataFrame, updates0: DataFrame, keys: Seq[String],
                attrs: Seq[String], effectiveTs: String): DataFrame = {
    val keyCols = keys.map(col)
    // latest update per key (deterministic: ties on effectiveTs break on
    // the attribute struct)
    val wLatest = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*)
      .orderBy(col(effectiveTs).desc, struct(attrs.map(col): _*).desc)
    val updates = updates0
      .withColumn("__rn", row_number().over(wLatest))
      .filter(col("__rn") === 1).drop("__rn")
    val cur = dim.filter(col("is_current"))
    val attrStruct = struct(attrs.map(col): _*)
    // real changes only: current version differs from the update
    val curAttrs = attrs.foldLeft(cur.select((keys ++ attrs).map(col): _*)) {
      (df, a) => df.withColumnRenamed(a, s"__cur_$a")
    }
    val changes = updates.join(curAttrs, keys, "left")
      .filter(attrs.map(a => col(s"__cur_$a").isNull ||
        col(s"__cur_$a") =!= col(a)).reduce(_ || _))
      .select((keys ++ attrs :+ effectiveTs).map(col): _*)
    val changedKeys = changes.select(keyCols: _*).distinct()
    val closed = cur.join(broadcast(changedKeys), keys, "left_semi")
      .join(changes.select((keys :+ effectiveTs).map(col): _*), keys)
      .withColumn("valid_to", col(effectiveTs))
      .withColumn("is_current", lit(false))
      .drop(effectiveTs)
    val untouchedCur = cur.join(changedKeys, keys, "left_anti")
    val newVersions = changes
      .withColumn("valid_from", col(effectiveTs))
      .withColumn("valid_to", lit(null).cast(dim.schema("valid_to").dataType))
      .withColumn("is_current", lit(true))
      .drop(effectiveTs)
    dim.filter(!col("is_current"))
      .unionByName(untouchedCur)
      .unionByName(closed.select(dim.columns.map(col): _*))
      .unionByName(newVersions.select(dim.columns.map(col): _*))
  }

  // -------------------------------------------------------------- sinks

  /** K1/K3: parquet overwrite (snappy is Spark's default codec). */
  def writeOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)

  /** K2: Hive-style partitioned write
    * (reference: spark/jobs/silver_transformation.py:61-64). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)

  /** K4: single-file gold output (reference coalesce(1) —
    * spark/jobs/gold_aggregation.py:111). Only sane for small aggregates;
    * never use on unbounded data. */
  def writeSingleFile(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  /** K5: write-then-verify round trip (reference:
    * spark/jobs/mysql_bronze_ingestion.py:117-120). Returns the re-read
    * row count. */
  def writeAndVerify(df: DataFrame, path: String): Long = {
    writeOverwrite(df, path)
    df.sparkSession.read.parquet(path).count()
  }

  /** Bucketed table write (capability extension): hash-pre-shuffle the
    * data ONCE at write time into `nBuckets` files per partition, so
    * every later equi-join or aggregation on the bucket key plans
    * exchange-free (bucket-local sort-merge). At 100 TB this converts
    * the nightly fact⋈fact join from the dominant shuffle into a
    * coalesced local read — the batch analogue of co-partitioned
    * storage. Requires saveAsTable (bucket metadata lives in the
    * catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // A managed-table location left by a PREVIOUS session survives on
    // disk but not in this (in-memory) catalog, and saveAsTable then
    // refuses with LOCATION_ALREADY_EXISTS — clear the stale directory.
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(wh, table.toLowerCase))
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Range-clustered write: range-partition on `rangeCols`, sort within
    * each partition, write — every output file then covers a disjoint,
    * sorted key range, so parquet min/max footer stats let ANY reader
    * skip whole files/row-groups for range predicates on those columns.
    * The plain-parquet analogue of one-axis Z-ordering; at 100 TB this is
    * what turns a time-range query over a year of data into a scan of
    * one day's files. Range partitioning samples the data to pick
    * balanced bounds — skew-resistant without manual tuning. */
  def writeClustered(df: DataFrame, path: String, rangeCols: Seq[String],
                     nFiles: Int): Unit =
    df.repartitionByRange(nFiles, rangeCols.map(col): _*)
      .sortWithinPartitions(rangeCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Z-ordered write: range-partition + sort on the Morton interleave of
    * two integral columns (`functions.ZOrderCode`), so every output file
    * covers a compact bounding BOX in both dimensions — parquet min/max
    * stats then skip files/row-groups for range predicates on EITHER
    * column. One-axis clustering (`writeClustered`) only serves its own
    * axis; this is the 2-D layout a fact table needs when queries filter
    * by time AND key. Columns must be non-negative and fit in 32 bits
    * (rank/bucket-normalize upstream otherwise). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    nFiles: Int): Unit =
    df.withColumn("__graft_z",
      graft.functions.VecExpressions.zorderNative(col(colA), col(colB)))
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)

  /** N-dimensional Z-ordered write (`functions.ZOrderCodeN`): every file
    * gets a compact bounding box in ALL the given columns — the layout
    * for a fact table queried by any mix of time/key/tenant ranges.
    * Per-dimension precision is ⌊64/N⌋ bits; columns must be
    * non-negative and fit that width (bucket/rank-normalize upstream
    * otherwise). */
  def writeZOrderedN(df: DataFrame, path: String, cols: Seq[String],
                     nFiles: Int): Unit =
    df.withColumn("__graft_z",
      graft.functions.VecExpressions.zorderNativeN(cols.map(col): _*))
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈rows / targetRowsPerFile⌉ files via staged write + directory swap.
    * The operational countermeasure to the many-small-files problem that
    * incremental upserts/streaming sinks accumulate — at 100 TB, run per
    * partition so each compaction touches bounded data. Returns the new
    * file count. */
  def compact(spark: SparkSession, path: String,
              targetRowsPerFile: Long): Int = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    val staging = path.stripSuffix("/") + "__compacting"
    df.repartition(files).write.mode("overwrite").parquet(staging)
    val dir = new java.io.File(path)
    val tmp = new java.io.File(staging)
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    if (!tmp.renameTo(dir))
      throw new java.io.IOException(s"compaction swap failed: $staging -> $path")
    spark.read.parquet(path).inputFiles.length
  }

  /** Versioned snapshot write (time travel on plain parquet): each call
    * lands a complete snapshot under `base/v=<n+1>` via staging + atomic
    * rename, so concurrent readers of any existing version are never
    * disturbed and a crashed write leaves no visible partial version.
    * Returns the new version number. Old versions are retained until
    * `vacuumVersions` — the Delta/Iceberg snapshot-isolation pattern
    * with directories as the commit log. At 100 TB, pair with
    * partitioned snapshots so a version rewrite touches only changed
    * partitions.
    *
    * NOTE: `pipeline/GraftLog` unifies this, `upsert` and `compact` into
    * ONE table format with file-granular atomic commits (a snapshot here
    * rewrites everything; a graft-log commit swaps only changed files) —
    * prefer it for new tables; these helpers remain as the
    * directory-per-version primitive. */
  def writeVersioned(df: DataFrame, base: String): Int = {
    val dir = new java.io.File(base)
    dir.mkdirs()
    val next = currentVersion(base).getOrElse(0) + 1
    val staging = new java.io.File(base, s".staging_v$next")
    df.write.mode("overwrite").parquet(staging.getPath)
    val target = new java.io.File(base, s"v=$next")
    if (!staging.renameTo(target))
      throw new java.io.IOException(s"version commit failed: $staging -> $target")
    next
  }

  /** Highest committed version under `base`, if any. */
  def currentVersion(base: String): Option[Int] = {
    val files = Option(new java.io.File(base).listFiles()).getOrElse(Array.empty)
    val versions = files.filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toInt)
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** Read a specific snapshot version (default: latest). */
  def readVersion(spark: SparkSession, base: String,
                  version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(base)).getOrElse(
      sys.error(s"no committed versions under $base"))
    spark.read.parquet(s"$base/v=$v")
  }

  /** Drop all versions older than `keep` latest. Returns dropped count. */
  def vacuumVersions(base: String, keep: Int): Int = {
    val files = Option(new java.io.File(base).listFiles()).getOrElse(Array.empty)
    val versions = files.filter(f => f.isDirectory && f.getName.startsWith("v="))
      .sortBy(_.getName.stripPrefix("v=").toInt)
    val drop = versions.dropRight(keep)
    drop.foreach(org.apache.commons.io.FileUtils.deleteDirectory)
    drop.length
  }

  /** K6/K7: register the written location as an external table in the
    * session catalog (reference's Glue fallback:
    * spark/jobs/mysql_gold_aggregation.py:160-176). */
  def registerExternal(spark: SparkSession, db: String, table: String,
                       location: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    spark.sql(
      s"CREATE TABLE $db.$table USING PARQUET LOCATION '$location'")
    spark.sql(s"REFRESH TABLE $db.$table")
  }
}
