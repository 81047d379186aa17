package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the real version of the
  * reference's placeholder audit column (silver writes a constant
  * `data_quality_check = "passed"` without checking anything;
  * spark/jobs/silver_transformation.py:62-66). The shape follows the
  * public expectations pattern (Delta Live Tables expectations, AWS
  * Deequ): declare constraints, get per-constraint violation counts, or
  * split the frame into clean/quarantine halves.
  *
  * Scale design: every ROW-LOCAL constraint (not-null, range, regex,
  * custom predicate) and every uniqueness constraint folds into ONE
  * aggregation pass over the table (conditional sums + distinct counts
  * share the same scan); only referential checks add a pass each — an
  * anti-join against the (broadcast when bounded) dimension. `split` is
  * map-only: one filter per half, no shuffle. */
object Quality {

  sealed trait Constraint { def name: String }

  /** Violation: the column is NULL. */
  final case class NotNull(column: String) extends Constraint {
    def name = s"not_null($column)"
  }

  /** Violation: value outside [lo, hi]. NULLs are NOT violations (declare
    * NotNull separately — one failure mode per constraint). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    def name = s"in_range($column)"
  }

  /** Violation: the string does not match `pattern` (Java regex,
    * unanchored — anchor with ^$ for full-match). NULLs pass. */
  final case class MatchesRegex(column: String, pattern: String)
      extends Constraint {
    def name = s"matches_regex($column)"
  }

  /** Violation count: surplus rows beyond the first per key
    * (count(*) − count(DISTINCT columns)). DISTINCT ignores NULL keys
    * (standard SQL), so every null-keyed row counts as a violation —
    * a unique key is implicitly a non-null key. */
  final case class Unique(columns: Seq[String]) extends Constraint {
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Violation: a non-null key with no match in `dim.dimColumn`
    * (foreign-key orphans). `broadcastDim` for bounded dimensions; a
    * 100 TB-side dimension should pass false and let the planner pick a
    * shuffled join. */
  final case class RefIntegrity(column: String, dim: DataFrame,
                                dimColumn: String,
                                broadcastDim: Boolean = true)
      extends Constraint {
    def name = s"ref_integrity($column)"
  }

  /** Violation: `pred` is false. NULL predicate results pass (declare
    * NotNull separately). */
  final case class Satisfies(label: String, pred: Column) extends Constraint {
    def name = s"satisfies($label)"
  }

  private def rowViolation(c: Constraint): Option[Column] = c match {
    case NotNull(cl) => Some(col(cl).isNull)
    case InRange(cl, lo, hi) => Some(col(cl) < lit(lo) || col(cl) > lit(hi))
    case MatchesRegex(cl, p) => Some(!col(cl).rlike(p))
    case Satisfies(_, p) => Some(!p)
    case _ => None
  }

  /** One row per constraint: (cname, n_violations, passed), sorted by
    * name. Row-local + uniqueness constraints share a single aggregation
    * job; each referential constraint adds one anti-join count. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints declared")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "duplicate constraint names")
    val rowLocal = constraints.flatMap(c => rowViolation(c).map(c.name -> _))
    val uniques = constraints.collect { case u: Unique => u }
    val aggs =
      rowLocal.map { case (n, pred) =>
        sum(when(coalesce(pred, lit(false)), 1L).otherwise(0L)).as(n) } ++
      uniques.map(u =>
        (count(lit(1)) - countDistinct(col(u.columns.head),
          u.columns.tail.map(col): _*)).as(u.name))
    val scanned: Seq[(String, Long)] =
      if (aggs.isEmpty) Seq.empty
      else {
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        (rowLocal.map(_._1) ++ uniques.map(_.name))
          .map(n => n -> r.getAs[Long](n))
      }
    val referential = constraints.collect {
      case c @ RefIntegrity(cl, dim, dimCl, bcast) =>
        val keys = dim.select(col(dimCl).as("__k")).distinct()
        val side = if (bcast) broadcast(keys) else keys
        c.name -> df.select(col(cl).as("__k"))
          .filter(col("__k").isNotNull)
          .join(side, Seq("__k"), "left_anti")
          .count()
    }
    import df.sparkSession.implicits._
    (scanned ++ referential).sortBy(_._1)
      .toDF("cname", "n_violations")
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Throw unless every constraint passes — the task-body form: inside
    * an `Orchestrator.Task`, a failed gate fails the task and the
    * scheduler skips everything downstream of the bad data (the
    * fail-the-DAG-not-the-lake pattern). */
  def gate(df: DataFrame, constraints: Seq[Constraint]): Unit = {
    val bad = check(df, constraints)
      .filter(!col("passed"))
      .select(col("cname"), col("n_violations"))
      .collect() // bounded by constraint count
    if (bad.nonEmpty)
      throw new IllegalStateException("data-quality gate failed: " +
        bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
  }

  /** Split into (clean, quarantine) on the ROW-LOCAL constraints —
    * map-only, no shuffle. Quarantined rows carry a `violations` array
    * naming every constraint they break (the audit trail a reprocessing
    * pipeline needs). Aggregate constraints (Unique/RefIntegrity) have
    * no per-row meaning here; declare them in `check`. */
  def split(df: DataFrame, constraints: Seq[Constraint])
      : (DataFrame, DataFrame) = {
    val rowLocal = constraints.flatMap(c => rowViolation(c).map(c.name -> _))
    require(rowLocal.nonEmpty, "no row-local constraints to split on")
    val tags = rowLocal.map { case (n, pred) =>
      when(coalesce(pred, lit(false)), lit(n)) }
    val flagged = df.withColumn("violations",
      filter(array(tags: _*), x => x.isNotNull))
    (flagged.filter(size(col("violations")) === 0).drop("violations"),
      flagged.filter(size(col("violations")) > 0))
  }
}
