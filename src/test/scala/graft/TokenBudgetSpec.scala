package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Token-budget selection: prefix semantics exactly — a document that
  * would cross the budget is dropped AND so is everything after it,
  * even a later smaller document that would fit (order preserved, not
  * knapsack). */
class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // (id, score, tokens)
    (1L, 90L, 4L), (2L, 80L, 5L), (3L, 70L, 10L), (4L, 60L, 1L))
    .toDF("id", "score", "toks")

  private def kept(budget: Long): Seq[Long] =
    Sampling.selectTokenBudget(docs,
        Seq(col("score").desc, col("id")), col("toks"), budget)
      .select("id").as[Long].collect().sorted.toSeq

  test("inclusive prefix: budget boundary is exact") {
    assert(kept(9) == Seq(1L, 2L))   // 4+5 = 9 fits exactly
    assert(kept(8) == Seq(1L))       // doc 2 would cross
    assert(kept(3) == Seq.empty)     // even the best doc crosses
  }

  test("a crossing document stops the prefix — later fits do NOT sneak in") {
    // budget 10: docs 1,2 take 9; doc 3 (10 more) crosses; doc 4 (1
    // token) WOULD fit but is after the cut — prefix, not knapsack
    assert(kept(10) == Seq(1L, 2L))
  }

  test("ties break on the explicit key; result is partitioning-invariant") {
    val tied = Seq((1L, 50L, 3L), (2L, 50L, 3L), (3L, 50L, 3L))
      .toDF("id", "score", "toks")
    val a = Sampling.selectTokenBudget(tied.repartition(1),
      Seq(col("score").desc, col("id")), col("toks"), 6L)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.selectTokenBudget(tied.repartition(7),
      Seq(col("score").desc, col("id")), col("toks"), 6L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == Seq(1L, 2L) && b == a)
  }

  test("plan never funnels through one reducer for the running total") {
    val df = Sampling.selectTokenBudget(docs,
      Seq(col("score").desc, col("id")), col("toks"), 10L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-reducer global window:\n$plan")
  }
}
