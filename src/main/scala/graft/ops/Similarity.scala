package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vec
import graft.ops.Relational.topKPerGroup

/** Similarity search over embedding columns (array<float>).
  *
  * Scale design (100 TB):
  *  - `bruteForceTopK` broadcasts the (small) query set and streams the
  *    corpus partition-parallel — the corpus is never shuffled, so the
  *    cost is one scan regardless of executor count. The per-query top-k
  *    reduction happens in the window exec after shuffling only the
  *    (n_queries × corpus) scored pairs... which is the part that does
  *    NOT survive scale-up, hence:
  *  - `lshTopK` buckets corpus and queries by random-hyperplane signs
  *    (deterministic seed), multi-probes neighboring buckets, and only
  *    scores within buckets — the scored-pair count drops by the bucket
  *    fan-out factor, making the shuffle O(n/2^planes · probes).
  */
object Similarity {

  /** Score every (query, corpus) pair with rounded cosine. Query side is
    * broadcast; corpus side is never shuffled. */
  def scoreAllPairs(corpus: DataFrame, queries: DataFrame): DataFrame =
    queries.hint("broadcast").crossJoin(corpus)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", Vec.cosine6(col("qv"), col("v")))

  /** Exact top-k cosine neighbors per query by brute force.
    * `queries`: (query_id, qv: array<double>); `corpus`: (vec_id, v). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topKPerGroup(scoreAllPairs(corpus, queries), k,
      Seq(col("query_id")), Seq(col("cos").desc, col("vec_id")), "rank")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))

  /** All pairs (a < b within the given frames) above a cosine threshold —
    * embedding-based near-duplicate detection. */
  def cosineNearDuplicates(corpus: DataFrame, queries: DataFrame,
                           threshold: Double): DataFrame =
    scoreAllPairs(corpus, queries)
      .filter(col("query_id") < col("vec_id") && col("cos") >= threshold)
      .select(col("query_id").as("id_a"), col("vec_id").as("id_b"), col("cos"))

  /** Deterministic random hyperplanes (fixed seed → identical plan across
    * runs and executors). */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(42)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-LSH bucket id of a vector: bit p = 1 iff v · plane_p > 0
    * (native codegen'd expression; planes ride as a constant reference). */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column =
    graft.functions.VecExpressions.lshBucketNative(v, planes(nPlanes, dim))

  /** Approximate top-k: score only pairs sharing an LSH bucket, probing
    * the query's bucket plus all buckets at hamming distance 1. Recall is
    * tunable via nPlanes/probes; exactness is traded for a shuffle that
    * shrinks with 2^nPlanes. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val bucketedCorpus = corpus
      .withColumn("bucket", lshBucket(col("v"), nPlanes, dim))
    // query probes: own bucket + flip each bit once
    val probes = queries
      .withColumn("bucket0", lshBucket(col("qv"), nPlanes, dim))
      .withColumn("bucket", explode(array(
        col("bucket0") +:
          (0 until nPlanes).map(p => col("bucket0").bitwiseXOR(lit(1L << p))): _*)))
      .drop("bucket0")
    topKPerGroup(
      probes.join(bucketedCorpus, "bucket")
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("cos", Vec.cosine6(col("qv"), col("v"))),
      k, Seq(col("query_id")), Seq(col("cos").desc, col("vec_id")), "rank")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }
}
