package graft.sources

import org.apache.spark.sql.types.LongType

/** Scale pins for the Delta DML planner decisions. */
class DeltaDmlPlanSpec extends graft.SparkSpec {

  test("mergeUpsert's range join broadcasts the BOUNDED ranges side") {
    // the update side is unbounded at 100 TB; the stats-ranges side is
    // ≤ #files rows — the plan must build/broadcast the ranges, never
    // the updates
    import org.apache.spark.sql.functions._
    val updates = spark.range(100000).select(col("id").as("k"))
    val hits = DeltaDml.keyRangeHits(updates, "k", LongType,
      Seq((0, 0L, 10L), (1, 11L, 20L), (2, 21L, 999999L)))
    assert(hits.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2))
    val plan = hits.queryExecution.executedPlan.toString
    // ranges are an in-memory local table: they must sit under the
    // BroadcastExchange as the BuildRight side of the range join
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"),
      s"expected the ranges as the broadcast build side:\n$plan")
    assert(!plan.contains("BuildLeft"),
      s"the unbounded update side must never be the build side:\n$plan")
    assert(plan.contains("LocalTableScan [__fidx"),
      s"the broadcast subtree should be the bounded ranges table:\n$plan")
  }
}
