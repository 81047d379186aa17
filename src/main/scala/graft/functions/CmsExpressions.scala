package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd Count-Min-Sketch frequency estimate over a broadcast
  * sketch — same pattern as `BloomMightContainLong`: one virtual call on
  * an executor-local broadcast value per row, no UDF boxing, fused into
  * the surrounding WholeStageCodegen span. CMS guarantees
  * estimate >= true count, which is what makes a CMS prefilter
  * LOSSLESS for heavy-hitter detection (no false negatives; false
  * positives die in the exact verification pass). */
case class CmsEstimateLong(cmsB: Broadcast[CountMinSketch], child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  // ImplicitCast: integral keys coerce to long at analysis (AbstractDataType
  // is private[sql] in Spark 4; DataType is covariant-ok)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cms_estimate"

  override def nullSafeEval(v: Any): Any =
    cmsB.value.estimateCount(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsBroadcast", cmsB,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ((org.apache.spark.util.sketch.CountMinSketch) $ref.value()).estimateCount((long) $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsExpressions {
  def estimateLong(cmsB: Broadcast[CountMinSketch], key: Column): Column =
    GraftBridge.column(CmsEstimateLong(cmsB, GraftBridge.expression(key)))
}
