package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Quality
import graft.pipeline.Quality._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    // (id, price, code, fk)
    (Some(1L), Some(10.0), Some("A-1"), Some(1L)),
    (Some(2L), Some(-5.0), Some("B-2"), Some(2L)),   // range violation
    (None,     Some(20.0), Some("A-3"), Some(1L)),   // null id
    (Some(4L), None,       Some("bad"), Some(9L)),   // regex violation + orphan fk
    (Some(4L), Some(30.0), None,        None)        // duplicate id; null code/fk pass
  ).toDF("id", "price", "code", "fk")

  private def dim = Seq(1L, 2L, 3L).toDF("k")

  test("check counts every violation kind in one pass; nulls only fail NotNull") {
    val got = Quality.check(frame, Seq(
      NotNull("id"),
      InRange("price", 0.0, 100.0),
      MatchesRegex("code", "^[A-Z]-"),
      Unique(Seq("id")),
      RefIntegrity("fk", dim, "k")))
      .as[(String, Long, Boolean)].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(got("not_null(id)") == ((1L, false)))
    assert(got("in_range(price)") == ((1L, false))) // null price passes
    assert(got("matches_regex(code)") == ((1L, false))) // null code passes
    // 5 rows − 3 distinct non-null ids: the dup AND the null row are
    // surplus (DISTINCT ignores nulls — same in DuckDB, so cross-engine)
    assert(got("unique(id)") == ((2L, false)))
    assert(got("ref_integrity(fk)") == ((1L, false))) // 9 is an orphan; null fk passes
  }

  test("an all-clean table passes every constraint") {
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "price")
    val got = Quality.check(clean, Seq(
      NotNull("id"), InRange("price", 0.0, 10.0), Unique(Seq("id")),
      Satisfies("price_gt_zero", col("price") > 0)))
    assert(got.filter(!col("passed")).count() == 0)
  }

  test("a failed quality gate fails its orchestrator task and skips downstream") {
    import graft.pipeline.Orchestrator
    val ran = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val tasks = Seq(
      Orchestrator.Task("validate_silver") { _ =>
        Quality.gate(frame, Seq(NotNull("id")))
      },
      Orchestrator.Task("publish_gold", deps = Seq("validate_silver")) { _ =>
        ran.add("gold")
      })
    val report = Orchestrator.run(spark, tasks)
    assert(report.results("validate_silver").status == Orchestrator.Failed)
    assert(report.results("validate_silver").error
      .exists(_.getMessage.contains("not_null(id)=1")))
    assert(report.results("publish_gold").status == Orchestrator.Skipped)
    assert(ran.isEmpty, "gold must not publish on bad silver")
    // and a clean gate lets the pipeline through
    val ok = Orchestrator.run(spark, Seq(
      Orchestrator.Task("validate") { _ =>
        Quality.gate(Seq((1L, 2.0)).toDF("id", "price"), Seq(NotNull("id")))
      },
      Orchestrator.Task("publish", deps = Seq("validate"))(_ => ran.add("ok"))))
    assert(ok.succeeded && ran.size == 1)
  }

  test("split quarantines row-local violators with a named audit trail") {
    val (clean, bad) = Quality.split(frame, Seq(
      NotNull("id"),
      InRange("price", 0.0, 100.0),
      MatchesRegex("code", "^[A-Z]-")))
    assert(clean.count() == 2) // rows 1 and 5 (null code passes regex)
    assert(bad.count() == 3)
    val viols = bad.select(col("id"), col("violations"))
      .as[(Option[Long], Seq[String])].collect().toMap
    assert(viols(Some(2L)) == Seq("in_range(price)"))
    assert(viols(None) == Seq("not_null(id)"))
    assert(viols(Some(4L)) == Seq("matches_regex(code)"))
    // split is map-only: no exchange in either half's plan
    assert(!clean.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
