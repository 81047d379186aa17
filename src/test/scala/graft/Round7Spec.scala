package graft

import org.apache.spark.sql.functions._

/** Unicode normalize + clean (the pretraining pipeline's first text
  * pass): NFC composition via the custom codegen'd expression, control
  * stripping, whitespace collapse. */
class NormalizeCleanSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.TextAnalysis.normalizeClean

  test("NFC composes, controls strip, spaces collapse, ends trim") {
    val got = Seq("  ab   é  ").toDF("t")
      .select(normalizeClean(col("t")).as("c")).head().getString(0)
    assert(got == "ab é") // BEL gone, runs collapsed, é composed (1 char)
  }

  test("tab/newline/CR survive (they are token boundaries, not noise)") {
    val got = Seq("a\tb\nc\rd").toDF("t")
      .select(normalizeClean(col("t")).as("c")).head().getString(0)
    assert(got == "a\tb\nc\rd")
  }

  test("already-clean ASCII is unchanged (fast path)") {
    val got = Seq("plain ascii text").toDF("t")
      .select(normalizeClean(col("t")).as("c")).head().getString(0)
    assert(got == "plain ascii text")
  }

  test("null propagates") {
    val got = Seq(Option.empty[String]).toDF("t")
      .select(normalizeClean(col("t")).as("c")).head()
    assert(got.isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq("x é  y", "plain").toDF("t")
      .select(normalizeClean(col("t")).as("c"))
    val codegen = df.collect().map(_.getString(0)).toSeq
    val interp = spark.createDataFrame(df.rdd, df.schema) // breaks codegen lineage
    assert(codegen == interp.collect().map(_.getString(0)).toSeq)
  }
}

/** Round-5 plan pins for the third TPC-H batch (Q2/Q6/Q8/Q9/Q11/Q12/
  * Q13/Q15/Q16/Q20 shapes, queries q131–q140): each already passes the
  * value-exact oracle gate; these pin the plan properties that make
  * them scale — decorrelated subqueries, no cartesian blowups, pushed
  * scans, broadcast dimensions. */
class TpchBatch3PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q131 (Q2) correlated min-cost subquery decorrelates to a grouped join") {
    val p = plan("q131_tpch_q2")
    // the per-part min over supply cost must run ONCE as an aggregate,
    // not per outer row; no cartesian anywhere in the 5-table graph
    assert(p.contains("HashAggregate"), s"expected grouped min in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q132 (Q6) is a pure scan-aggregate: no join, filters pushed") {
    val p = plan("q132_tpch_q6")
    assert(!p.contains("Join"), s"Q6 must not join:\n$p")
    assert(p.contains("PushedFilters: ["), s"expected pushed filters in:\n$p")
    // at least one range predicate actually reaches the parquet reader
    assert(p.contains("GreaterThan") || p.contains("IsNotNull"),
      s"no predicate reached the scan:\n$p")
  }

  test("q133 (Q8) market share: dims broadcast, no cartesian over the 7 tables") {
    val p = plan("q133_tpch_q8")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dims in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q134 (Q9) profit query joins hash-to-hash, nation broadcast") {
    val p = plan("q134_tpch_q9")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast nation in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"NLJ in:\n$p")
  }

  test("q135 (Q11) global scalar threshold is a one-row broadcast, not a rescan per group") {
    val p = plan("q135_tpch_q11")
    // group-HAVING vs global-sum: the global sum must appear as a
    // one-row subquery/broadcast input (a 1-row BNLJ build side is fine),
    // never a full cartesian over the groups
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(p.contains("HashAggregate"), s"expected hash agg in:\n$p")
  }

  test("q136 (Q12) two-flag conditional agg: one join, one aggregate") {
    val p = plan("q136_tpch_q12")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // shipmode IN (...) + date range pushed to the lineitem scan
    assert(p.contains("PushedFilters: ["), s"expected pushed filters in:\n$p")
  }

  test("q137 (Q13) outer-join count distribution keeps the LEFT OUTER shape") {
    val p = plan("q137_tpch_q13")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"),
      s"expected outer join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q138 (Q15) revenue view max: aggregate computed once, equality-joined back") {
    val p = plan("q138_tpch_q15")
    assert(p.contains("HashAggregate"), s"expected hash agg in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q139 (Q16) supplier exclusion is an anti join, not a filter-per-row") {
    val p = plan("q139_tpch_q16")
    assert(p.contains("LeftAnti"), s"expected anti join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q140 (Q20) nested IN chain becomes semi joins all the way down") {
    val p = plan("q140_tpch_q20")
    assert(p.contains("LeftSemi"), s"expected semi join chain in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }
}
