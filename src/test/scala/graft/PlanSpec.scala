package graft

/** Physical-plan shape assertions: the properties that make the declared
  * plans survive a 100 TB scale-up are not left to inspection — they are
  * pinned by test. A regression that silently un-pushes a filter or
  * un-broadcasts a bounded dimension fails here, not in production. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q08 ships the shipdate predicate into the parquet scan") {
    val plan = planOf("q08_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"filter not pushed:\n$plan")
  }

  test("q08 scan reads only the referenced columns") {
    val plan = planOf("q08_pricing_summary")
    // 6 columns referenced out of lineitem's 16 — pruning must hold
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      s"column pruning lost:\n$readSchema")
  }

  test("q12 star join broadcasts the bounded dimensions") {
    val plan = planOf("q12_join_star_revenue")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q01 aggregates partially before the shuffle (map-side combine)") {
    val plan = planOf("q01_category_summary")
    assert(plan.contains("HashAggregate(keys=[p_brand") &&
      plan.contains("partial_count"), s"no partial aggregation:\n$plan")
  }

  test("q05 whole-stage codegen covers the scan-filter-agg pipeline") {
    // AQE prints codegen spans only in the FINAL plan — execute first
    val df = SparkEntry.queries("q05_null_filter")(spark, dir)
    df.collect()
    // codegen'd operators carry the "*(stageId)" marker in the tree string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter") && plan.contains("*(1) HashAggregate"),
      s"scan-filter-agg not inside one codegen stage:\n$plan")
  }
}
