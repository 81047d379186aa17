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

  test("q100 graft-log range scan pushes the range predicate into parquet") {
    val plan = planOf("q100_log_pruned_scan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), GreaterThanOrEqual(l_orderkey"),
      s"range filter not pushed into the pruned scan:\n$plan")
  }

  test("q78 bloom prefilter plan has no ScalaUDF (codegen'd probe)") {
    val plan = planOf("q78_bloom_prefilter")
    assert(!plan.contains("ScalaUDF"), s"UDF crept back into the bloom probe:\n$plan")
    assert(plan.contains("graft_bloom_might_contain"), s"native probe missing:\n$plan")
  }

  test("q116/q175 mixture rank has no per-source single-task exchange") {
    // the scale-killer shape is Exchange hashpartitioning(__src) feeding
    // the rank window: every row of a source through ONE reducer. The
    // range-partitioned groupedRank must never re-introduce it — the
    // data window partitions by (__pid, __src), so any hashpartitioning
    // on __src ALONE in the executed plan is a regression.
    for (q <- Seq("q116_training_mix", "q175_temperature_mix")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect() // AQE: final plan exists only after execution
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.matches("(?s).*hashpartitioning\\(__src#\\d+, \\d+\\).*"),
        s"$q funnels a source through one task:\n$plan")
    }
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

  test("q89 binds the year filter to partition directories (pruning)") {
    val df = SparkEntry.queries("q89_partition_pruning")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"no partition filter bound:\n$plan")
    // pruned scan must touch only the 1997 directory (collect from the
    // pre-adaptive plan: AdaptiveSparkPlanExec hides its subtree from
    // collectLeaves)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.isDefined, s"no FileSourceScanExec:\n${df.queryExecution.sparkPlan}")
    val files = scan.get.relation.location.listFiles(
      scan.get.partitionFilters, scan.get.dataFilters)
    assert(files.map(_.values.getInt(0)).forall(_ == 1997),
      s"scanned partitions: ${files.map(_.values)}")
  }

  test("q87 pushes the region name and order-date filters to the scans") {
    val plan = planOf("q87_tpch_q5")
    assert(plan.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date filter not pushed:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast joins:\n$plan")
  }

  test("q87 join graph: nation and region are broadcast build sides; no cartesian/BNLJ") {
    // Catalyst/AQE pick q87's join order and strategies today — this pins
    // the properties that matter so a Spark upgrade (or a stats change)
    // can't silently regress the join graph into a shuffle of the 25-row
    // dims or, worse, a cartesian explosion.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // sf0.01, not sf0.001: the 1994-ASIA slice can be legitimately EMPTY
    // at the smallest scale, and AQE then (correctly) collapses the whole
    // plan to EmptyRelation — there is no join graph left to pin. The pin
    // needs a scale where rows survive every join.
    val df = SparkEntry.queries("q87_tpch_q5")(spark, "/root/testdata/sf0.01")
    df.collect() // AQE: final plan exists only after execution
    def finalOf(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def all(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(all)) ++ (p match {
        case qs: QueryStageExec => all(qs.plan)
        case _ => Seq.empty
      })
    val nodes = all(finalOf(df.queryExecution.executedPlan))
    val names = nodes.map(_.nodeName)
    assert(!names.exists(n => n.contains("CartesianProduct") ||
      n.contains("BroadcastNestedLoopJoin")),
      s"q87 must have no unbounded join: ${names.distinct}")
    assert(names.count(_.contains("BroadcastHashJoin")) >= 2,
      s"expected >=2 broadcast joins (nation, region): ${names.distinct}")
    // nation and region scans must sit UNDER a broadcast stage, never on
    // a shuffled side
    def scansUnder(p: SparkPlan): Seq[String] = all(p).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.mkString(",")
    }
    val broadcastScans = nodes.collect {
      case qs: QueryStageExec if qs.nodeName.contains("Broadcast") =>
        scansUnder(qs.plan)
      case e if e.nodeName.contains("BroadcastExchange") => scansUnder(e)
    }.flatten
    Seq("nation", "region").foreach { t =>
      assert(broadcastScans.exists(_.contains(t)),
        s"$t is not on a broadcast side; broadcast scans: $broadcastScans")
    }
  }

  test("q117 top-k plans as TakeOrdered (no global sort) over hash joins only") {
    val df = SparkEntry.queries("q117_tpch_q3")(spark, dir)
    df.collect() // AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"LIMIT 10 must plan as TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q117's comma-joins must all bind to equi-joins:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter must reach the customer scan:\n$plan")
  }

  test("q118 IN-subquery plans as ONE semi join against the grouped frame") {
    // The HAVING-aggregate runs once, map-side combined, as a semi-join
    // build — not as a per-row subquery re-execution. Pinning LeftSemi +
    // no-unbounded-join keeps a Spark upgrade from silently degrading
    // the decorrelation.
    val df = SparkEntry.queries("q118_tpch_q18")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"IN-subquery must decorrelate to a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q118 must have no unbounded join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"LIMIT 20 must plan as TakeOrdered:\n$plan")
    assert(plan.contains("partial_sum"),
      s"the big-order aggregate must combine map-side:\n$plan")
  }

  test("q120 correlated aggregate subquery decorrelates to one grouped join") {
    // The per-part avg must run as ONE aggregate over lineitem joined
    // back on l_partkey — never re-executed per outer row, and never via
    // an unbounded join.
    val df = SparkEntry.queries("q120_tpch_q17")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q120 must have no unbounded join:\n$plan")
    assert(plan.contains("partial_avg"),
      s"the correlated avg must plan as a map-side-combined aggregate:\n$plan")
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
