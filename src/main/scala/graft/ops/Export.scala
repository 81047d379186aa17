package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LAST MILE of a training-data pipeline: materialize a corpus as
  * deterministically SHUFFLED, size-bounded shards a data loader can
  * stream sequentially (the webdataset / Megatron shard shape — loaders
  * read shards in order and get a global permutation without seeking).
  *
  * Why not `df.orderBy(rand())`: rand() is seed- and partitioning-
  * dependent, so re-running the export (or running it on a different
  * cluster layout) silently produces a different epoch order —
  * irreproducible training data. Here the order key is
  * `md5(seed || row-key)`: a pure row property, bit-identical on any
  * engine/partitioning/scale. A new `seed` is a fresh epoch-level
  * permutation of the SAME corpus.
  *
  * Scale shape: ONE range shuffle on the hash (no global sort on a
  * single reducer, no driver collection). Shard boundaries come from
  * range partitioning and are approximately balanced; the global ORDER
  * is exact and deterministic, boundary placement may shift with input
  * partitioning (documented — loaders only need order + coverage). */
object Export {

  /** Write `df` as `nShards` parquet shards under `path` in the seeded
    * pseudo-random global order; shard i holds the i-th contiguous hash
    * range, rows sorted by hash within it. Returns the shard INDEX
    * (shard_id, n_rows, bytes) — the manifest a loader uses to plan an
    * epoch — computed from the written files' footers (no data re-read:
    * count(*) over parquet is metadata-only). */
  def shuffledShards(df: DataFrame, path: String, key: Column,
                     seed: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val spark = df.sparkSession
    val h = md5(concat_ws("|", lit(seed), key.cast("string")))
    df.withColumn("__shuffle", h)
      .repartitionByRange(nShards, col("__shuffle"))
      .sortWithinPartitions("__shuffle")
      .drop("__shuffle") // projection after sort keeps partition order
      .write.mode("overwrite").parquet(path)
    shardIndex(spark, path)
  }

  /** The shard index of an exported directory: one row per shard file
    * in order, with row count (parquet footer metadata) and bytes. */
  def shardIndex(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val rows = files.zipWithIndex.map { case (f, i) =>
      val n = spark.read.parquet(f.getPath).count() // footer-only
      (i, f.getName, n, f.length())
    }.toSeq
    rows.toDF("shard_id", "file", "n_rows", "bytes")
  }

  /** Read an export back IN EPOCH ORDER: shards in index order, rows in
    * file order (the order `shuffledShards` wrote). For verification
    * and single-reader loaders; distributed training readers consume
    * shard subsets directly. */
  def readShards(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
