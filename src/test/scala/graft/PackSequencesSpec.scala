package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Sampling}

/** Sequence-packing block arithmetic on a hand-computed corpus, and the
  * distributed prefix sum it rides on (q173 covers the oracle path). */
class PackSequencesSpec extends SparkSpec {
  import spark.implicits._

  test("blocks, straddles, starts, and fills are exact") {
    // doc lengths 3, 2, 4 at B=4: stream [0,9) cuts at 4 and 8.
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"))
      .toDF("doc_id", "text")
    val got = Sampling.packSequences(docs, col("doc_id"), col("text"), 4L)
      .orderBy("block_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 4L), // doc1 whole + doc2's first token
      (1L, 2L, 1L, 4L), // doc2's tail + doc3 starts
      (2L, 1L, 0L, 1L))) // doc3's last token — the short tail block
  }

  test("a doc longer than a block spans several blocks") {
    val docs = Seq((1L, Seq.fill(10)("w").mkString(" "))).toDF("doc_id", "text")
    val got = Sampling.packSequences(docs, col("doc_id"), col("text"), 3L)
      .orderBy("block_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 1L, 1L, 3L), (1L, 1L, 0L, 3L),
      (2L, 1L, 0L, 3L), (3L, 1L, 0L, 1L)))
  }

  test("packing plan has no single-partition exchange (scale pin)") {
    // the whole point of globalPrefixSum: a naive global-order window
    // would plan Exchange SinglePartition and serialize 100 TB through
    // one task. Pin the plan so a refactor can't regress it.
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val plan = Sampling.packSequences(docs, col("doc_id"), col("text"), 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"sequence packing serializes through one partition:\n$plan")
    // the range-partitioned frame is PINNED by an eager localCheckpoint
    // (lineage truncated so offsets can never drift — see
    // Relational.pinBounded), so the final plan reads the materialized
    // blocks instead of re-planning the range exchange
    assert(plan.contains("ExistingRDD"),
      s"expected the checkpointed (pinned) range partitioning:\n$plan")
  }

  test("globalPrefixSum equals a sequential scan on any partitioning") {
    val df = spark.range(1000).select(col("id"),
      ((col("id") * 37) % 11 + 1).as("v")).repartition(13)
    val got = Relational.globalPrefixSum(df, Seq(col("id")), col("v"), "ps")
      .orderBy("id").collect().map(_.getAs[Long]("ps"))
    val expect = (0L until 1000L).map(i => (i * 37) % 11 + 1)
      .scanLeft(0L)(_ + _).tail
    assert(got.toSeq == expect)
  }
}
