package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Sampling}

/** DSIR importance weighting + the distributed global rank under it. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank equals single-partition row_number on any data") {
    val df = (1L to 1000L).map(i => (i, (i * 37) % 101)).toDF("id", "v")
      .repartition(7)
    val got = Relational.globalRank(df, Seq(col("v").desc, col("id")))
      .select(col("id"), col("rnk")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v").desc, col("id"))))
      .select(col("id"), col("rnk").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("globalRank plan has no single-partition window exchange") {
    val df = (1L to 100L).toDF("id")
    val plan = Relational.globalRank(df, Seq(col("id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"globalRank collapsed to one partition:\n$plan")
  }

  test("weights move the right way: target-like docs outrank off-target docs") {
    // target = "spark"-heavy docs; an unseen-vocabulary doc must sink
    val docs = Seq(
      (1L, "spark spark join spark", true),
      (2L, "spark join spark table", true),
      (3L, "spark spark spark join", false),  // target-like but raw
      (4L, "zebra yak quux corge",  false))   // off-distribution
      .toDF("doc_id", "text", "is_t")
    val w = Sampling.dsirWeights(docs, col("doc_id"), col("text"),
        col("is_t"), buckets = 64, selectFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(3L) > w(4L), s"target-like doc should outrank off-target: $w")
    assert(w(1L) > w(4L))
  }

  test("selected marks exactly floor(N*frac) docs, by weight then doc_id") {
    val docs = (1L to 20L).map(i =>
      (i, if (i <= 10) "a b c" else "x y z", i <= 10)).toDF("doc_id", "text", "is_t")
    val out = Sampling.dsirWeights(docs, col("doc_id"), col("text"),
      col("is_t"), buckets = 32, selectFrac = 0.25).collect()
    assert(out.count(_.getBoolean(3)) == 5) // floor(20 * .25)
    // ties broken by doc_id: within the identical-text group the lowest ids win
    val sel = out.filter(_.getBoolean(3)).map(_.getLong(0)).sorted.toSeq
    val topWeight = out.map(r => (r.getDouble(2), r.getLong(0))).sortBy(t => (-t._1, t._2))
      .take(5).map(_._2).sorted.toSeq
    assert(sel == topWeight)
  }
}
