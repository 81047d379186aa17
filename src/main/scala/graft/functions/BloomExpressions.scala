package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a broadcast filter.
  *
  * Replaces the one Scala UDF that used to sit in a hot path
  * (`Relational.bloomPrefilterJoin`): a UDF boxes every key, breaks the
  * WholeStageCodegen span around the pre-shuffle filter, and hides the
  * predicate from Catalyst. This expression keeps the probe inside
  * generated code — one virtual call on an executor-local broadcast
  * value per row, no boxing — so the bloom prefilter stage fuses with
  * the scan it protects. The broadcast ships the (possibly ~MB-scale)
  * filter once per executor instead of once per task.
  */
case class BloomMightContainLong(bloomB: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BooleanType
  // ImplicitCast (not plain ExpectsInputTypes): an int/short fact key
  // coerces to long at analysis like the UDF this replaced; only truly
  // incompatible types fail. (AbstractDataType is private[sql] in
  // Spark 4; the public subtype DataType satisfies the override
  // covariantly.)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloomB.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomBroadcast", bloomB,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ((org.apache.spark.util.sketch.BloomFilter) $bfRef.value()).mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  def mightContainLong(bloomB: Broadcast[BloomFilter], key: Column): Column =
    GraftBridge.column(BloomMightContainLong(bloomB, GraftBridge.expression(key)))
}
