package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed access to the driver-generated testdata tables (TESTDATA.md).
  *
  * Mirrors the reference's table-per-parquet-directory data model
  * (reference: spark/jobs/mysql_silver_transformation.py:42 reads bare
  * parquet paths) but pins access behind one loader so call sites never
  * hardcode paths. At 100 TB these would be catalog tables; `register`
  * exposes them via the session catalog the same way the reference's
  * Glue fallback does (reference: spark/jobs/mysql_gold_aggregation.py:168-176).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configuration the testdata requires. Applied ONCE at
    * session construction by every entry point (Verify / Bench / tools /
    * spec harness); the loader itself must not mutate session state as a
    * side effect.
    *  - nanosAsLong: makes a TIMESTAMP(NANOS)-encoded events.parquet
    *    readable at all (one of the three historically observed drift
    *    encodings);
    *  - outputTimestampType=TIMESTAMP_MICROS: write modern int64 micros
    *    instead of legacy INT96 — INT96 carries no usable footer
    *    statistics, which would blind every footer-stats consumer
    *    (event-time guard, zone maps) on engine-written timestamps, and
    *    DuckDB (the oracle) reads int64 micros natively. */
  def withTestdataConfs(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

  // Per-session (dir, table, source stamp) memo of the LOADED FRAME:
  // every call to spark.read.parquet re-lists the directory and
  // re-reads a footer for schema on the driver — pure metadata work,
  // but at ~250 bench queries × several loads each it is a measurable
  // slice of every query's driver gap (guide §6: listing/planning is
  // driver-side, single-process work). The memo caches the PLAN, never
  // any result rows; the stamp key makes an in-place testdata
  // regeneration (the documented drift scenario) reload instead of
  // serving a plan over deleted files. Weak-keyed by session so closed
  // sessions are not retained.
  private val loaded = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val memo = loaded.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    memo.computeIfAbsent(s"$dir|$name|${tableStamp(dir, name)}",
      _ => loadUncached(spark, dir, name))
  }

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts has drifted across testdata generations: parquet
      // TIMESTAMP(NANOS) (which Spark surfaces as int64 only under the
      // nanosAsLong legacy flag set by withTestdataConfs) and native
      // timestamp[us] (which Spark reads as TIMESTAMP_NTZ when the
      // writer leaves isAdjustedToUTC false). Never assume a physical
      // encoding — branch on the schema the reader actually produced.
      // Session TZ is pinned to UTC everywhere (Verify/Bench/specs), so
      // NTZ→TZ cast is value-identical and matches how DuckDB (the
      // oracle) reads the same file.
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          // int64 ns-since-epoch: truncate to micros with integral div —
          // a double-precision divide corrupts values beyond 2^53.
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampType    => raw
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case other => throw new IllegalStateException(
          s"events.ts: unsupported physical type $other — testdata drifted again; " +
          "extend Tables.load (and EventStreams.readEventStream) for this encoding")
      }
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }

  // Per-session, PER-TABLE memo so the 29 SQL-surface queries sharing
  // one Verify/Bench session don't re-read 10 parquet footers each.
  // Weak-keyed by session (no strong retention of closed sessions);
  // a table that failed to load is never memoized (so the next
  // registerAll retries it), and the (dir, table, source stamp) key
  // makes an in-place testdata regeneration (the documented drift
  // scenario) re-register instead of serving views over deleted files.
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  private def tableStamp(dir: String, name: String): String = {
    val f = new java.io.File(s"$dir/$name.parquet")
    s"${f.lastModified()}_${f.length()}"
  }

  /** Register every table as a temp view so spark.sql(...) matches the
    * oracle's table naming.
    *
    * Fault-isolated: one unreadable table must not take down queries that
    * never touch it (round-4 incident: a drifted events.parquet broke all
    * 22 TPC-H shapes via this loop). A table that fails to load is logged
    * loudly and its view dropped — only queries actually referencing it
    * fail, with TABLE_OR_VIEW_NOT_FOUND pointing at the logged cause. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val seen = registered.computeIfAbsent(spark,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    names.foreach { n =>
      val key = s"$dir|$n|${tableStamp(dir, n)}"
      if (!seen.contains(key)) {
        try {
          load(spark, dir, n).createOrReplaceTempView(n)
          seen.add(key)
        } catch { case e: Exception =>
          spark.catalog.dropTempView(n) // no stale view from a previous dir
          System.err.println(
            s"[tables] table '$n' failed to load from $dir — queries touching it " +
            s"will fail with TABLE_OR_VIEW_NOT_FOUND; cause: ${e.getMessage}")
        }
      }
    }
  }
}
