package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis.{jaccard, shingleSet}

/** Deduplication for document corpora, exact and near-duplicate.
  *
  * Scale design (100 TB):
  *  - Exact dedup is one hash-groupBy — a single shuffle on a 128-bit
  *    digest, no data movement of the full text needed once the digest
  *    column is projected.
  *  - MinHash LSH turns O(n²) near-dup detection into: per-doc signature
  *    computation (embarrassingly parallel) → band-bucket shuffle →
  *    pair generation only inside buckets → exact jaccard verification
  *    only for candidates. No driver-side state at any step.
  *  - SimHash uses the pigeonhole band trick for hamming-radius search —
  *    the same bucket-join shape.
  */
object Dedup {

  /** Exact duplicate groups keyed by md5 of the normalized key column.
    * Keeps the minimum id as the deterministic canonical representative. */
  def exactDuplicateGroups(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(md5(key).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Classic keep-one-arbitrary exact dedup (reference-style dropDuplicates). */
  def dropExact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  private val MinhashPrime = 2147483647L // 2^31 - 1

  /** k-permutation MinHash signatures, computed the codegen-friendly way:
    * explode shingles to rows, murmur3-hash each, then ONE vectorized
    * hash-aggregate with k `min((a_i·x + b_i) mod p)` columns (universal
    * hashing; parameters derive deterministically from the permutation
    * index). This keeps the whole computation inside whole-stage codegen —
    * the per-element lambda form (transform/array_min) is interpreted and
    * profiled ~10× slower. Docs with no shingles (shorter than the
    * shingle width) drop out, which is correct: they cannot collide.
    *
    * Input: (docId, shinglesCol). Output: (doc_id, sig array<bigint>). */
  def minhashSignatures(docs: DataFrame, id: Column, shingles: Column,
                        numHashes: Int): DataFrame = {
    val p = lit(MinhashPrime)
    val exploded = docs.select(id.as("doc_id"), explode(shingles).as("sh"))
      .select(col("doc_id"), pmod(hash(col("sh")).cast("long"), p).as("x"))
    val aggs = (0 until numHashes).map { i =>
      val a = lit(2L * i + 1) // odd multipliers, |a·x| < 2^38: no overflow
      val b = lit((i.toLong * 40503L + 10501L) % MinhashPrime)
      min(pmod(a * col("x") + b, p)).as(s"s$i")
    }
    exploded.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"s$i")): _*).as("sig"))
  }

  /** LSH-verified near-duplicate pairs (id_a < id_b) with exact jaccard ≥
    * threshold, computed over the hashed shingle space (murmur3 mod p —
    * collision effects are negligible and halve the verify cost vs
    * string-set intersection).
    *
    * Pipeline: shingle → hash → persist the (small) per-doc hashed
    * shingle sets → minhash signatures → band buckets → candidate pairs
    * inside buckets only → exact jaccard verification of candidates. The
    * persist matters: the hashed-shingle frame feeds the signature
    * explosion, both sides of the band self-join, and both verification
    * joins — without it the whole shingling pipeline re-executes ~5×
    * (profiled 169 s → 18 s at sf0.1). At 100 TB this materialization is
    * the standard signature-table checkpoint of a dedup pipeline. */
  def minhashNearDuplicates(df: DataFrame, id: Column, text: Column,
                            shingleN: Int = 3, numHashes: Int = 64,
                            bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val p = lit(MinhashPrime)
    // Repartition before the compute-heavy shingling: a small parquet
    // arrives as one partition, and tokenization must be materialized
    // ahead of the shingle lambda (see TextAnalysis.shingleSet).
    val hashed = df.select(id.as("doc_id"), text.as("text"))
      .repartition(col("doc_id"))
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        sort_array(array_distinct(transform(
          shingleSet(col("toks"), shingleN),
          s => pmod(hash(s).cast("long"), p)))).as("sh"))
      .persist()
    val exploded = hashed.select(col("doc_id"), explode(col("sh")).as("x"))
    val aggs = (0 until numHashes).map { i =>
      val a = lit(2L * i + 1) // odd multipliers, |a·x| < 2^38: no overflow
      val b = lit((i.toLong * 40503L + 10501L) % MinhashPrime)
      min(pmod(a * col("x") + b, p)).as(s"s$i")
    }
    val sigs = exploded.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"s$i")): _*).as("sig"))
    // (doc_id, band_idx, band_hash): hash of each signature slice
    val bucketed = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows)))))
        .as(Seq("band_idx", "band_hash")))
      .persist()
    val candidates = bucketed.alias("a")
      .join(bucketed.alias("b"), Seq("band_idx", "band_hash"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct() // a pair may collide in several bands
    candidates
      .join(hashed.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("n_inter",
        graft.functions.ArrayExpressions.sortedIntersectCount(
          col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over xxhash64 token hashes: bit i of the result is
    * set iff Σ_tokens (2·bit_i(h)−1) > 0. Computed codegen-friendly:
    * explode tokens, hash once per token, then one vectorized
    * hash-aggregate with 64 per-bit sum columns recombined into the
    * signature long. Docs with no tokens drop out (no signal → no bits).
    *
    * Input: (docId, toksCol). Output: (doc_id, simhash). */
  def simhashSignatures(docs: DataFrame, id: Column, toks: Column): DataFrame = {
    val hashed = docs.select(id.as("doc_id"), explode(toks).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitAggs = (0 until 64).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$i")
    }
    hashed.groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-duplicate pairs within hamming distance `maxHamming`.
    * 4×16-bit band pigeonhole: any pair at distance ≤ 3 shares at least
    * one intact band, so the bucket join finds it without O(n²). */
  def simhashPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val banded = sigs.selectExpr("doc_id", "simhash",
      "posexplode(transform(sequence(0, 3), b -> shiftright(simhash, b * 16) & 65535)) AS (band_idx, band_val)")
      .select("doc_id", "simhash", "band_idx", "band_val")
    val a = banded.select(col("band_idx"), col("band_val"),
      col("doc_id").as("id_a"), col("simhash").as("sig_a"))
    val b = banded.select(col("band_idx"), col("band_val"),
      col("doc_id").as("id_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
