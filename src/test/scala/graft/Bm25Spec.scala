package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** BM25 scoring: exact formula check on a hand-built corpus (scores
  * recomputed in plain scala math), plus plan-shape guards — the term
  * filter must reach below the shuffle and the df/stats joins must be
  * broadcasts. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"),
    (2L, "a c"),
    (3L, "c c c")).toDF("doc_id", "text")

  test("matches the closed-form BM25 on a tiny corpus") {
    val k1 = 1.2; val b = 0.75
    val n = 3.0; val avgdl = (3.0 + 2.0 + 3.0) / 3.0
    def idf(df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    val expected = Map(
      1L -> BigDecimal(w(2, 3, 2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      2L -> BigDecimal(w(1, 2, 2) + w(1, 2, 2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      3L -> BigDecimal(w(3, 3, 2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val got = TextAnalysis.bm25(docs, col("doc_id"), col("text"), Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 == 1L && got(2L)._1 == 2L && got(3L)._1 == 1L)
    expected.foreach { case (id, s) =>
      assert(math.abs(got(id)._2 - s) < 1e-9, s"doc $id: got ${got(id)._2}, want $s")
    }
  }

  test("docs matching no query term are absent; unknown terms ignored") {
    val got = TextAnalysis.bm25(docs, col("doc_id"), col("text"), Seq("b", "zzz"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L)) // only d1 contains "b"; "zzz" matches nothing
  }

  test("plan: term filter below the aggregate, df and stats joins broadcast") {
    val plan = TextAnalysis.bm25(docs, col("doc_id"), col("text"), Seq("a", "c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    // the isin prunes the exploded token stream before the tf aggregate
    assert(plan.contains("term#") || plan.toLowerCase.contains("filter"))
  }
}
