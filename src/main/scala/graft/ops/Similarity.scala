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
    * runs and executors). `table` offsets the seed so multi-table LSH
    * gets independent plane sets. */
  private def planes(nPlanes: Int, dim: Int, table: Int = 0): Array[Array[Double]] = {
    val rng = new scala.util.Random(42 + 1000 * table)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-LSH bucket id of a vector: bit p = 1 iff v · plane_p > 0
    * (native codegen'd expression; planes ride as a constant reference). */
  def lshBucket(v: Column, nPlanes: Int, dim: Int, table: Int = 0): Column =
    graft.functions.VecExpressions.lshBucketNative(v, planes(nPlanes, dim, table))

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

  /** SemDeDup (Abbas et al., arXiv:2303.09540) — semantic deduplication
    * by embedding clustering: vectors are assigned to the deterministic
    * IVF quantizer's cells once (map-only, centroid matrix is a plan
    * constant), and near-duplicate pairs are detected only WITHIN a
    * cell — the k-means trick that turns all-pairs cosine dedup into
    * per-cluster work, quadratic only in cell size (dialed by `nLists`;
    * the paper uses the same within-cluster restriction, trading
    * cross-cluster dup recall for cost).
    *
    * Survivor rule: a vector is dropped iff some LOWER-id vector in its
    * cell matches it at cosine ≥ threshold — deterministic, one
    * self-join + one anti join, no iterative closure. (For exact
    * one-per-connected-component semantics, close the pairs with
    * Dedup.connectedComponents instead; per the paper, the pairwise
    * rule is what SemDeDup ships.)
    *
    * Returns (vec_id, cluster_id, keep). `corpus`: (vec_id, v). */
  def semDedup(corpus: DataFrame, threshold: Double,
               nLists: Int = 16, lloydIters: Int = 2): DataFrame = {
    val cents = trainIvfCentroids(corpus, nLists, lloydIters)
    val bucketed = corpus.withColumn("cluster_id", element_at(
      graft.functions.VecExpressions.nearestCentroidsNative(col("v"), cents, 1), 1))
    val left = bucketed.select(col("cluster_id"),
      col("vec_id").as("id_a"), col("v").as("va"))
    val right = bucketed.select(col("cluster_id"),
      col("vec_id").as("id_b"), col("v").as("vb"))
    // ids that duplicate a lower id in their cell
    val dropped = left.join(right, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(Vec.cosine6(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    bucketed.select(col("vec_id"), col("cluster_id"))
      .join(dropped.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        coalesce(col("__dup"), lit(false)).unary_!.as("keep"))
  }

  /** Multi-table sign-LSH top-k: `nTables` INDEPENDENT plane sets, each
    * bucketing corpus and queries separately (with hamming-1 multiprobe
    * per table); candidates are the union over tables, deduped before
    * scoring. This is the standard L-tables LSH construction: per-table
    * collision probability p gives overall recall 1−(1−p)^L, so recall
    * is dialed by L without coarsening the buckets — the knob that keeps
    * recall high even on weakly-clustered embeddings, where any single
    * table must either miss neighbors or degenerate to a full scan. At
    * 100 TB each table is one map-side bucket assignment + one equi-join
    * shuffle; tables are independent, so they parallelize trivially, and
    * the dedup is a shuffle on (query_id, vec_id) candidate pairs only. */
  def lshTopKMulti(corpus: DataFrame, queries: DataFrame, k: Int,
                   nTables: Int = 8, nPlanes: Int = 5,
                   dim: Int = 64): DataFrame = {
    val candidates = (0 until nTables).map { t =>
      val bucketedCorpus = corpus
        .withColumn("bucket", lshBucket(col("v"), nPlanes, dim, t))
      val probes = queries
        .withColumn("bucket0", lshBucket(col("qv"), nPlanes, dim, t))
        .withColumn("bucket", explode(array(
          col("bucket0") +:
            (0 until nPlanes).map(p => col("bucket0").bitwiseXOR(lit(1L << p))): _*)))
        .drop("bucket0")
      probes.hint("broadcast").join(bucketedCorpus, "bucket")
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
    }.reduce(_ unionByName _)
      // dedup across tables BEFORE scoring: each candidate pair scores once
      .dropDuplicates("query_id", "vec_id")
    topKPerGroup(
      candidates.withColumn("cos", Vec.cosine6(col("qv"), col("v"))),
      k, Seq(col("query_id")), Seq(col("cos").desc, col("vec_id")), "rank")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  /** Recall@k of an approximate top-k result against the exact one: the
    * fraction of (query, neighbor) pairs in the exact top-k the ANN
    * result recovered. Both inputs use the bruteForceTopK/lshTopK/ivfTopK
    * output shape (query_id, rank, vec_id, ...). One semi-join + two
    * global counts — metadata-scale output, corpus-free: the recorded
    * quality gate for every ANN index this engine ships. */
  def recallAtK(ann: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val e = exact.filter(col("rank") <= k).select(col("query_id"), col("vec_id"))
    val a = ann.filter(col("rank") <= k).select(col("query_id"), col("vec_id"))
    val hit = e.join(a, Seq("query_id", "vec_id"), "left_semi")
      .groupBy().agg(count(lit(1)).as("n_hit"))
    val tot = e.groupBy().agg(count(lit(1)).as("n_exact"))
    tot.crossJoin(hit)
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_exact"), 4))
  }

  /** Approximate top-k: score only pairs sharing an LSH bucket, probing
    * the query's bucket plus all buckets at hamming distance 1. Recall is
    * tunable via nPlanes/probes; exactness is traded for a shuffle that
    * shrinks with 2^nPlanes. NOTE: a single table's recall collapses on
    * weakly-clustered embeddings (measured 0.23@3 on the near-random
    * testdata vectors at 6 planes — q96 records this); when recall
    * matters more than the last factor of shuffle reduction, use
    * `lshTopKMulti`, whose L independent tables dial recall to
    * 1−(1−p)^L without coarsening buckets. */
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
