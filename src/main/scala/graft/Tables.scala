package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so spark.sql(...) matches the
    * oracle's table naming. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
