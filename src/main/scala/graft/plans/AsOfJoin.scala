package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** Whole-operator as-of join: logical node + planner strategy + physical
  * merge operator, following SURVEY.md §7.4's preference order (c) — used
  * when composition (a) and scalar expressions (b) can't express an
  * operator's *execution strategy*, only its result.
  *
  * Spark has no native as-of join. The composed formulation
  * (ops/Relational.asOfJoin: union both sides, carry values with a
  * last-over-window) is correct and single-shuffle, but it materializes
  * the union and runs a window frame per row. This operator keeps the
  * single shuffle (ClusteredDistribution on the key, same co-partitioning
  * contract as SortMergeJoin) and replaces the window with a two-pointer
  * streaming merge of the two sorted children — O(n+m) per partition,
  * O(1) state (the one candidate right row), no union materialization.
  * EnsureRequirements supplies exchanges/sorts only when the children
  * aren't already partitioned/sorted right, so bucketed or pre-sorted
  * inputs plan exchange-free — exactly like a stock join.
  *
  * Semantics (backward): for each left row, the LAST right row of the
  * same key with right.ts <= left.ts (inclusive). Forward: the FIRST
  * right row with right.ts >= left.ts. Missing match → nulls.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute],
    asofOutput: Seq[Attribute],
    forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofOutput
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, rv, out, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, rv, out, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute],
    asofOutput: Seq[Attribute],
    forward: Boolean) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  /** Same contract as SortMergeJoin: both sides hash-clustered on the
    * key (EnsureRequirements co-partitions them) and sorted by
    * (key, ts) within partitions. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  /** Rows stream out in the left child's partitioning and order. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(Seq(lKeyIdx, lTsIdx, rKeyIdx, rTsIdx).forall(_ >= 0),
      "as-of join columns must be direct child outputs")
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
    val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
    val rightOut = right.output
    val valueExprs = rightValues
    val fwd = forward

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val valueProj = UnsafeProjection.create(valueExprs, rightOut)
      val nullValues = new GenericInternalRow(valueExprs.length)
      val outFields = left.output.map(a => (a.dataType, a.nullable)) ++
        asofOutput.map(a => (a.dataType, true))
      val outProj = UnsafeProjection.create(outFields.zipWithIndex.map {
        case ((dt, nullable), i) => BoundReference(i, dt, nullable) })
      val joined = new JoinedRow
      val buffered = rIter.buffered

      // Backward state: the last right row consumed (whole-row copy —
      // shuffle readers reuse row buffers), valid while its key matches.
      var lastRight: InternalRow = null

      lIter.map { lRow =>
        // Null semantics (interpreted orderings NPE on nulls, and a null
        // key/ts has no meaningful as-of position): null-keyed/null-ts
        // LEFT rows emit unmatched; null-keyed/null-ts RIGHT rows are
        // skipped. Nulls sort first under the required Ascending order,
        // so skipping them at the head costs nothing.
        val lNull = lRow.isNullAt(lKeyIdx) || lRow.isNullAt(lTsIdx)
        if (lNull) {
          joined(lRow, nullValues)
        } else {
          val lk = lRow.get(lKeyIdx, keyType)
          val lt = lRow.get(lTsIdx, tsType)
          if (!fwd) {
            // consume every right row with (key, ts) <= (lk, lt)
            var continue = true
            while (continue && buffered.hasNext) {
              val head = buffered.head
              if (head.isNullAt(rKeyIdx) || head.isNullAt(rTsIdx)) {
                buffered.next()
              } else {
                val c = keyOrd.compare(head.get(rKeyIdx, keyType), lk)
                if (c < 0 || (c == 0 && tsOrd.compare(head.get(rTsIdx, tsType), lt) <= 0)) {
                  lastRight = buffered.next().copy()
                } else continue = false
              }
            }
            val matched = lastRight != null &&
              keyOrd.compare(lastRight.get(rKeyIdx, keyType), lk) == 0
            joined(lRow, if (matched) valueProj(lastRight) else nullValues)
          } else {
            // discard every right row strictly before (lk, lt); head, if
            // same-keyed, is the first at-or-after match (inclusive)
            var continue = true
            while (continue && buffered.hasNext) {
              val head = buffered.head
              if (head.isNullAt(rKeyIdx) || head.isNullAt(rTsIdx)) {
                buffered.next()
              } else {
                val c = keyOrd.compare(head.get(rKeyIdx, keyType), lk)
                if (c < 0 || (c == 0 && tsOrd.compare(head.get(rTsIdx, tsType), lt) < 0)) {
                  buffered.next()
                } else continue = false
              }
            }
            val matched = buffered.hasNext &&
              !buffered.head.isNullAt(rKeyIdx) &&
              keyOrd.compare(buffered.head.get(rKeyIdx, keyType), lk) == 0
            joined(lRow, if (matched) valueProj(buffered.head) else nullValues)
          }
        }
        numOutputRows += 1
        outProj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Make the strategy available on a live session (idempotent); also
    * injected by `graft.GraftExtensions` for config-built sessions. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** As-of join `left` with `right` on `keyCol`, matching by `tsCol`
    * (backward: latest right at-or-before; forward: earliest right
    * at-or-after). `valueCols` from `right` emit as `asof_<name>`
    * (null when unmatched) — same contract as ops/Relational.asOfJoin,
    * planned as the native merge operator. */
  def asOfJoinNative(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, valueCols: Seq[String],
                     forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    // fresh aliases on the right side: new ExprIds, so self-joins can't
    // produce conflicting attributes in the custom node
    val rightSel = right.select(
      (col(keyCol).as("__r_key") +: col(tsCol).as("__r_ts") +:
        valueCols.map(c => col(c).as(s"__r_$c"))): _*)
    val lp = GraftBridge.logicalPlan(left)
    val rp = GraftBridge.logicalPlan(rightSel)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in ${plan.output.map(_.name)}"))
    val rv = valueCols.map(c => attr(rp, s"__r_$c"))
    val asofOut = valueCols.zip(rv).map { case (c, a) =>
      AttributeReference(s"asof_$c", a.dataType, nullable = true)()
    }
    GraftBridge.ofRows(spark, AsOfJoinNode(
      lp, rp,
      attr(lp, keyCol), attr(lp, tsCol),
      attr(rp, "__r_key"), attr(rp, "__r_ts"),
      rv, asofOut, forward))
  }
}
