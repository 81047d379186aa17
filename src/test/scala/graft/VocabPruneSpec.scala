package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** pruneRareTokens edge semantics on hand-built corpora (q164 covers
  * the oracle path on the documents table). */
class VocabPruneSpec extends SparkSpec {
  import spark.implicits._

  test("global threshold prunes rare tokens, preserving order") {
    // corpus: a×2 b×2 c×1 rare×1 (total 6). keepPerMille=200 → keep
    // iff freq*1000 >= 6*200 = 1200 → freq >= 2 → only a, b survive.
    val docs = Seq((1L, "a b c"), (2L, "b rare a")).toDF("doc_id", "text")
    val got = TextAnalysis.pruneRareTokens(docs, col("doc_id"), col("text"),
        keepPerMille = 200L)
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a b", 2L), (2L, "b a", 2L)))
  }

  test("a document of only rare tokens vanishes") {
    val docs = Seq((1L, "x x x x"), (2L, "y")).toDF("doc_id", "text")
    // total 5; keepPerMille=500 → keep iff freq*1000 >= 2500 → x (4) only
    val got = TextAnalysis.pruneRareTokens(docs, col("doc_id"), col("text"),
        keepPerMille = 500L)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.head.getString(1) == "x x x x")
  }

  test("threshold boundary is exact integer arithmetic") {
    // total 10, keepPerMille=200 → keep iff freq*1000 >= 2000 → freq >= 2
    // EXACTLY at the boundary: freq 2 kept, freq 1 dropped.
    val docs = Seq((1L, "p p q q r s t u v w")).toDF("doc_id", "text")
    val got = TextAnalysis.pruneRareTokens(docs, col("doc_id"), col("text"),
        keepPerMille = 200L).collect()
    assert(got.head.getString(1) == "p p q q")
    assert(got.head.getLong(2) == 4L)
  }
}
