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
    * `queries`: (query_id, qv: array<double>); `corpus`: (vec_id, v).
    * The per-query reduction is the fused TopKPairs aggregator: each map
    * partition contributes ≤ k candidates per query, so the shuffle
    * carries k × partitions rows per query — NOT the full n_q × corpus
    * scored-pair set a window ranking would move. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    scoreAllPairs(corpus, queries)
      .groupBy(col("query_id"))
      .agg(graft.functions.VecAgg.topKPairs(k)(
        col("cos"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("idx", "t")))
      .select(col("query_id"), (col("idx") + 1).cast("long").as("rank"),
        col("t._2").as("vec_id"), col("t._1").as("cos"))

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

  /** Deterministic IVF coarse quantizer: Lloyd iterations over the corpus
    * with centroids seeded from the `nLists` lowest-id vectors (no RNG —
    * identical index across runs/executors). Centroids are driver-side
    * state, but their size is nLists × dim doubles — metadata-scale, like
    * a broadcast join's build side, NOT data-scale: the corpus itself is
    * only ever scanned partition-parallel (assignment is a map with the
    * centroid matrix as a plan constant; the mean-update is one
    * posexplode + hash-agg shuffle of nLists × dim partials per
    * partition). At 100 TB, train on a fixed corpus sample and reuse the
    * index across queries — the shape below is unchanged. */
  def trainIvfCentroids(corpus: DataFrame, nLists: Int,
                        lloydIters: Int = 2): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = corpus
      .orderBy(col("vec_id")).limit(nLists)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = cents.head.length
    for (_ <- 0 until lloydIters) {
      val sums = corpus
        .withColumn("list_id", element_at(
          graft.functions.VecExpressions.nearestCentroidsNative(col("v"), cents, 1), 1))
        .select(col("list_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("list_id"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(nLists)(i => cents(i).clone()) // empty lists keep old centroid
      sums.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  /** IVF-flat approximate top-k: corpus vectors are bucketed into
    * `nLists` Voronoi cells once (one map pass); each query scores only
    * the cells of its `nProbe` nearest centroids. The scored-pair count
    * drops by ~nLists/nProbe versus brute force, and — unlike sign-LSH —
    * cell population adapts to the data distribution, so recall degrades
    * gracefully on clustered corpora. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4,
              lloydIters: Int = 2): DataFrame = {
    val cents = trainIvfCentroids(corpus, nLists, lloydIters)
    val bucketedCorpus = corpus.withColumn("list_id", element_at(
      graft.functions.VecExpressions.nearestCentroidsNative(col("v"), cents, 1), 1))
    val probes = queries.withColumn("list_id", explode(
      graft.functions.VecExpressions.nearestCentroidsNative(col("qv"), cents, nProbe)))
    topKPerGroup(
      probes.hint("broadcast").join(bucketedCorpus, "list_id")
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("cos", Vec.cosine6(col("qv"), col("v"))),
      k, Seq(col("query_id")), Seq(col("cos").desc, col("vec_id")), "rank")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

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
      probes.hint("broadcast").join(bucketedCorpus, "bucket")
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("cos", Vec.cosine6(col("qv"), col("v"))),
      k, Seq(col("query_id")), Seq(col("cos").desc, col("vec_id")), "rank")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }
}
