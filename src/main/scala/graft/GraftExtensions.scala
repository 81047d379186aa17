package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSim, DotProduct, MinHashSig, NearestCentroids, SimHash64, SortedIntersectCount, ZOrderCode}

/** SparkSessionExtensions hook exposing graft's native expressions to
  * the SQL surface (`spark.sql("SELECT graft_cosine(a, b) ...")`) — the
  * idiomatic integration point for a Catalyst extension library: set
  * `spark.sql.extensions=graft.GraftExtensions` at session build, or
  * call `GraftExtensions.register(spark)` on a live session (same
  * builders into the session's FunctionRegistry).
  *
  * The reference has no extension surface at all — its only SQL is DDL
  * plus one SELECT * (reference: spark/jobs/mysql_gold_aggregation.py:160-179);
  * this is part of the engine's value-add (SURVEY.md §7.4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // whole-operator extension: native as-of join (graft.plans.AsOfJoin)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // optimizer extension: band joins rewritten to linear binned form
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinBinningRule)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  private[graft] val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) =>
        MinHashSig(args(0), intArg(args(1), "graft_minhash"))),
    ("graft_sorted_intersect_count",
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    ("graft_zorder",
      new ExpressionInfo(classOf[ZOrderCode].getName, "graft_zorder"),
      (args: Seq[Expression]) => ZOrderCode(args(0), args(1))))

  /** Idempotent post-hoc registration on a live session (for sessions
    * built without the extensions config, e.g. notebook attach). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
