package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** removeRepeatedSpans edge semantics (q177 hash-checks the rebuilt
  * text per doc on the documents corpus). */
class ExactSubstringSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], n: Int) =
    Dedup.removeRepeatedSpans(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), n = n)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("a cross-doc repeated span is cut from BOTH documents") {
    val span = "the quick brown"
    val docs = Seq(
      (1L, s"alpha $span beta"),   // 5 tokens, span at pos 1..3
      (2L, s"$span gamma delta"))  // span at pos 0..2
    // n=3: repeated shingle = span → 3 tokens cut from each doc
    assert(run(docs, 3) == Seq((1L, 2L), (2L, 2L)))
  }

  test("an intra-doc repeat is NOT cross-doc and survives") {
    val docs = Seq(
      (1L, "x y z x y z"),  // "x y z" twice, same doc only
      (2L, "p q r s t u"))
    assert(run(docs, 3) == Seq((1L, 6L), (2L, 6L)))
  }

  test("documents shorter than the span width pass through whole") {
    val docs = Seq((1L, "a b"), (2L, "a b"))
    assert(run(docs, 3) == Seq((1L, 2L), (2L, 2L)))
  }

  test("a fully-duplicated document vanishes entirely") {
    val docs = Seq((1L, "m n o p"), (2L, "m n o p"), (3L, "solo doc here ok"))
    // n=4: the whole 4-token doc is one repeated shingle → docs 1,2 gone
    assert(run(docs, 4) == Seq((3L, 4L)))
  }
}
