package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Round-4 continuation specs: connected-components dedup clustering. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain, triangle and cross-cluster isolation (both paths)") {
    // chain 1-2-3-4, triangle 10-11-12, bridge-free pair 20-21
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // driver union-find fast path (default threshold)
    val fast = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    // distributed doubling loop, forced by a zero threshold
    val dist = Dedup.connectedComponents(edges, "id_a", "id_b",
      smallGraphThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(fast == expected)
    assert(dist == expected)
  }

  test("pointer doubling converges logarithmically on a 64-node chain") {
    // naive neighbor-min needs 63 rounds to push label 0 down the chain;
    // doubling must do it in ≤ 10 (log2(63) ≈ 6, plus slack)
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("s", "d")
    val got = Dedup.connectedComponents(edges, "s", "d", maxIter = 10,
      smallGraphThreshold = 0L).as[(Long, Long)].collect()
    assert(got.length == 64 && got.forall(_._2 == 0L))
  }

  test("maxIter exhaustion throws instead of returning wrong labels") {
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("s", "d")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, "s", "d", maxIter = 2,
        smallGraphThreshold = 0L)
    }
  }

  test("fast path handles string node ids (generic orderable type)") {
    val edges = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("s", "d")
    val got = Dedup.connectedComponents(edges, "s", "d")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("mixture: exact per-source counts, epoch tagging, repeat guard") {
    import graft.ops.Sampling
    val docs = (1L to 10L).map(i => (i, if (i <= 6) "a" else "b", i * 100))
      .toDF("id", "src", "chars")
    val targets = Seq(("a", 3L), ("b", 9L)).toDF("source", "target")
    val mix = Sampling.mixture(docs, col("src"), col("id"), targets,
      allowRepeat = true)
    val bySrc = mix.groupBy("src")
      .agg(count(lit(1)).as("n"), max(col("__epoch")).as("e"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // a: 6 rows → 3 (downsample, epoch 1); b: 4 rows → 9 = 2 full copies
    // + 1 remainder (max epoch 3 for exactly one row)
    assert(bySrc == Map("a" -> ((3L, 1L)), "b" -> ((9L, 3L))))
    // determinism: same mix regardless of partitioning
    val again = Sampling.mixture(docs.repartition(7), col("src"), col("id"),
      targets, allowRepeat = true)
      .select("id", "__epoch").as[(Long, Long)].collect().sorted
    assert(again.toSeq ==
      mix.select("id", "__epoch").as[(Long, Long)].collect().sorted.toSeq)
    // oversample without allowRepeat is an error, not silent repetition
    intercept[IllegalArgumentException] {
      Sampling.mixture(docs, col("src"), col("id"), targets)
    }
    // a source with no target row has weight 0
    val dropB = Sampling.mixture(docs, col("src"), col("id"),
      Seq(("a", 2L)).toDF("source", "target"))
    assert(dropB.select("src").distinct().as[String].collect().toSeq ==
      Seq("a"))
  }

  test("dedupClusters: canonical flag keeps exactly one doc per cluster") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "a''"), (7L, "b"), (9L, "c"))
      .toDF("doc_id", "text")
    // 1~2, 2~3 chain; 7 and 9 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.dedupClusters(docs, col("doc_id"), pairs)
      .select(col("doc_id"), col("component"), col("is_canonical"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (7L, 7L, true), (9L, 9L, true)))
    // exactly one canonical per component
    val perComp = got.groupBy(_._2).map { case (_, g) => g.count(_._3) }
    assert(perComp.forall(_ == 1))
  }
}
