package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Round-4 continuation specs: chunk-level (sub-document) dedup and the
  * second TPC-H batch (Q4/Q7/Q10/Q14/Q19/Q21/Q22 shapes). */
class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  test("chunk dedup keeps first corpus-wide occurrence, rebuilds in order") {
    // doc 1: chunks [a b c] [d e f]; doc 2 repeats [a b c] then unique
    // [x y z]; doc 3 is entirely doc 1's content → fully dropped.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "a b c d e f")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, col("doc_id"), col("text"), 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got === Array(
      (1L, 2L, 2L, "a b c d e f"),
      (2L, 2L, 1L, "x y z"),
      (3L, 2L, 0L, "")))
  }

  test("first occurrence is the smallest (doc_id, chunk_idx), not arbitrary") {
    // the duplicate chunk appears at doc 5 idx 1 and doc 7 idx 0 —
    // doc 5 must win even though doc 7's copy is at a smaller index
    val docs = Seq(
      (5L, "u u u p q r"),
      (7L, "p q r w w w")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, col("doc_id"), col("text"), 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got === Array(
      (5L, 2L, 2L, "u u u p q r"),
      (7L, 2L, 1L, "w w w")))
  }

  test("ragged tail chunk participates like any other chunk") {
    val docs = Seq(
      (1L, "a b c d"), // chunks: [a b c], [d]
      (2L, "d")        // chunk [d] is a duplicate of doc 1's tail
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, col("doc_id"), col("text"), 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got === Array(
      (1L, 2L, 2L, "a b c d"),
      (2L, 1L, 0L, "")))
  }

  test("chunkWords=1 degenerates to corpus-wide word dedup") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, col("doc_id"), col("text"), 1)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got === Array((1L, 3L, 2L, "a b"), (2L, 2L, 1L, "c")))
  }
}

/** The TPC-H batch added late in round 4 runs through the oracle gate at
  * sf0.01; here we pin the plan properties that make them scale. */
class TpchBatch2PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q122 EXISTS becomes a semi join, not a per-row subquery") {
    val p = plan("q122_tpch_q4")
    assert(p.contains("LeftSemi"), s"expected semi join in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q126 disjunction still joins on the common p_partkey equality") {
    val p = plan("q126_tpch_q19")
    // CNF extraction must lift p_partkey = l_partkey into a hash join;
    // a BroadcastNestedLoopJoin over the full OR would be quadratic
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"disjunctive join degenerated to NLJ:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q127 double correlation becomes one semi and one anti join") {
    val p = plan("q127_tpch_q21")
    assert(p.contains("LeftSemi"), s"expected semi join in:\n$p")
    assert(p.contains("LeftAnti"), s"expected anti join in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q128 scalar threshold is a one-row subquery, anti join for NOT EXISTS") {
    val p = plan("q128_tpch_q22")
    assert(p.contains("LeftAnti"), s"expected anti join in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q123 nation legs broadcast (25-row dims never shuffle lineitem twice)") {
    val p = plan("q123_tpch_q7")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
