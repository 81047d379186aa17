package graft

import org.apache.spark.sql.functions._

import graft.functions.Vec
import graft.ops.{Dedup, Similarity, TextAnalysis}

class VecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f)),
    (2L, Seq(2.0f, 4.0f, 6.0f)),   // colinear with 1 → cosine 1.0
    (3L, Seq(-1.0f, 0.0f, 0.5f)),
    (4L, Seq(0.0f, 1.0f, 0.0f)))
    .toDF("vec_id", "embedding")
    .select($"vec_id", Vec.toDouble($"embedding").as("v"))

  test("native dot matches the higher-order-function formulation exactly") {
    val df = vecs.select($"vec_id", Vec.dot($"v", $"v").as("native"),
      Vec.dotHof($"v", $"v").as("hof"))
    df.collect().foreach(r => assert(r.getDouble(1) == r.getDouble(2)))
  }

  test("cosine of colinear vectors is 1") {
    val a = vecs.filter($"vec_id" === 1).select($"v".as("qv"), lit(1L).as("query_id"))
    val b = vecs.filter($"vec_id" === 2)
    val cos = a.crossJoin(b).select(Vec.cosine6($"qv", $"v")).as[Double].head()
    assert(cos == 1.0)
  }

  test("bruteForceTopK ranks the colinear vector first") {
    val queries = vecs.filter($"vec_id" === 1)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val top = Similarity.bruteForceTopK(vecs, queries, 2)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    assert(top.head == 2L) // the colinear vector wins
  }

  test("lshTopK finds the exact nearest neighbor on clustered data") {
    // 64-dim so lshBucket's planes (seeded for dim=64) apply.
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -0.5f)
    val near = base.clone(); near(0) += 0.01f
    val far = base.map(-_)
    val df = Seq((1L, base.toSeq), (2L, near.toSeq), (3L, far.toSeq))
      .toDF("vec_id", "embedding")
      .select($"vec_id", Vec.toDouble($"embedding").as("v"))
    val queries = df.filter($"vec_id" === 1)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val top1 = Similarity.lshTopK(df, queries, 1)
      .select($"vec_id").as[Long].head()
    assert(top1 == 2L)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely unrelated content here"),
    (4L, "the quick brown fox jumps over the lazy dog")) // exact dup of 1
    .toDF("doc_id", "text")

  test("exactDuplicateGroups keys on content and keeps min id") {
    val got = Dedup.exactDuplicateGroups(docs, col("doc_id"), col("text"))
      .orderBy("keep_id").select("keep_id", "n_copies")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("minhashNearDuplicates finds the near-dup pair and not the unrelated one") {
    val pairs = Dedup.minhashNearDuplicates(docs, col("doc_id"), col("text"),
      shingleN = 2, numHashes = 64, bands = 32, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dedupAgainstIndex: corpus hits and in-batch shadows drop; rest survive") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "some corpus document about completely other things today"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashIndex(corpus, col("doc_id"), col("text"))
    val incoming = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"), // corpus dup
      (21L, "a genuinely novel incoming document nothing resembles"),
      (22L, "a genuinely novel incoming document nothing resembles"), // in-batch dup of 21
      (23L, "")) // no shingles — must survive
      .toDF("doc_id", "text")
    val survivors = Dedup.dedupAgainstIndex(incoming, col("doc_id"),
      col("text"), index).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(21L, 23L))
  }

  test("dedupAgainstIndex never reads corpus text: a detached index works") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // persist the index and dedupe a batch against the STORED table —
    // the corpus frame itself is gone
    val p = "/tmp/graft_test_dedup_index"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    Dedup.minhashIndex(corpus, col("doc_id"), col("text"))
      .write.parquet(p)
    val stored = spark.read.parquet(p)
    val incoming = Seq(
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "unrelated fresh text with new tokens only"))
      .toDF("doc_id", "text")
    val survivors = Dedup.dedupAgainstIndex(incoming, col("doc_id"),
      col("text"), stored).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(3L))
  }

  test("dedupeAndAdvance: survivors advance the persisted index; " +
       "replay is idempotent") {
    import graft.pipeline.GraftLog
    val base = "/tmp/graft_test_dedup_advance"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    Dedup.buildIndex(spark, base, corpus, col("doc_id"), col("text"))
    val batch1 = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"), // corpus dup
      (21L, "a genuinely novel incoming document nothing resembles"))
      .toDF("doc_id", "text")
    val s1 = Dedup.dedupeAndAdvance(spark, base, batch1,
      col("doc_id"), col("text"), txnId = Some("b1"))
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == Set(21L))
    // the advance appended ONLY the survivor's signatures
    val idxDocs = GraftLog.read(spark, base)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(idxDocs == Set(10L, 21L))
    // batch 2 collides with batch-1's SURVIVOR, not only the corpus
    val batch2 = Seq(
      (30L, "a genuinely novel incoming document nothing resembles"),
      (31L, "another entirely distinct third wave document arrives"))
      .toDF("doc_id", "text")
    val s2 = Dedup.dedupeAndAdvance(spark, base, batch2,
      col("doc_id"), col("text"), txnId = Some("b2"))
      .select("doc_id").as[Long].collect().toSet
    assert(s2 == Set(31L))
    // REPLAY batch 1 with the same txnId: the index does not change
    // (txn idempotence) AND the survivors come back identical — a
    // doc's own indexed signatures never kill it
    val rowsBefore = GraftLog.read(spark, base).count()
    val s1replay = Dedup.dedupeAndAdvance(spark, base, batch1,
      col("doc_id"), col("text"), txnId = Some("b1"))
      .select("doc_id").as[Long].collect().toSet
    assert(s1replay == s1)
    assert(GraftLog.read(spark, base).count() == rowsBefore)
  }

  test("simhash: identical docs share signatures, unrelated docs differ") {
    val sigs = Dedup.simhashSignatures(docs, col("doc_id"),
      TextAnalysis.tokens(col("text")))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(4L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
      < java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)))
  }

  test("simhashPairs buckets hamming-close signatures together") {
    val sigs = Seq((1L, 0x0F0F0F0FL), (2L, 0x0F0F0F0EL), (3L, -1L))
      .toDF("doc_id", "simhash")
    val pairs = Dedup.simhashPairs(sigs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}

class ArrayExprSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.ArrayExpressions.sortedIntersectCount

  test("sortedIntersectCount equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("x")),
      (Seq("m"), Seq.empty[String]),
      (Seq("a", "z"), Seq("a", "z")))
      .toDF("x", "y")
    val got = df.select(
      sortedIntersectCount(col("x"), col("y")),
      size(array_intersect(col("x"), col("y"))).cast("long"))
      .as[(Long, Long)].collect()
    got.foreach { case (a, b) => assert(a == b) }
  }

  test("sortedIntersectCount works on long arrays") {
    val df = Seq((Seq(1L, 5L, 9L), Seq(1L, 2L, 9L, 10L))).toDF("x", "y")
    assert(df.select(sortedIntersectCount(col("x"), col("y")))
      .as[Long].head() == 2L)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("shingles are empty below width and windowed above") {
    val df = Seq("a b", "a b c d").toDF("text")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(TextAnalysis.shingleSet(col("toks"), 3).as("sh"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got.head == Seq())
    assert(got(1) == Seq("a b c", "b c d"))
  }

  test("jaccard is exact on set sizes") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(TextAnalysis.jaccard(col("x"), col("y"))).as[Double].head()
    assert(j == 2.0 / 4.0)
  }

  test("qualityMetrics ratios") {
    val got = TextAnalysis.qualityMetrics(Seq("the the word").toDF("text"), col("text"))
      .select("n_tokens", "n_distinct_tokens", "stopword_ratio")
      .as[(Long, Long, Double)].head()
    assert(got == ((3L, 2L, 2.0 / 3)))
  }

  test("langId argmax is deterministic with lexicographic tiebreak") {
    val got = TextAnalysis.langId(Seq("der und die xyz").toDF("text"), col("text"),
      Map("de" -> Seq("der", "und", "die"), "en" -> Seq("the")))
      .select("predicted_lang", "lang_score").as[(String, Long)].head()
    assert(got == (("de", 3L)))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fps = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(TextAnalysis.fingerprint(TextAnalysis.tokens(col("text"))))
      .as[Long].collect().toSeq
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }
}
