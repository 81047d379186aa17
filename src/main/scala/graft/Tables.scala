package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects outright. Read the raw int64 nanos and truncate to
      // micros with integral division (a double-precision divide would
      // corrupt ns-since-epoch values, which exceed 2^53). Truncation
      // matches how DuckDB (the oracle) reads the same file.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so spark.sql(...) matches the
    * oracle's table naming. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
