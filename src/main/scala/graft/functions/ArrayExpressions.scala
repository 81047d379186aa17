package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Intersection cardinality of two SORTED, DISTINCT arrays via a fused
  * merge loop — no intermediate array materialization, stays inside
  * whole-stage codegen.
  *
  * Spark's `size(array_intersect(a, b))` builds a hash set and an output
  * array per row pair; for n-gram-shingle jaccard scans that allocation
  * dominates (profiled: the q32 all-pairs scan spent 36s at sf0.1, ~90%
  * inside array_intersect). The merge loop does the same work in O(|a|+|b|)
  * comparisons with zero allocation. Inputs MUST be sorted ascending with
  * Spark's natural ordering (`sort_array(array_distinct(...))`); the
  * result equals `size(array_intersect(a, b))` exactly, so DuckDB's
  * `len(list_intersect(...))` remains a valid oracle.
  *
  * Supports array<string> and array<long> elements.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_intersect_count"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
        if a == b && (a == StringType || a == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two array<string> or two array<long> inputs, " +
            s"got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    if (elemType == StringType) {
      while (i < nx && j < ny) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Every local MUST be freshName'd: for non-nullable inputs
      // nullSafeCodeGen inlines this template WITHOUT a scoping block,
      // so two instances of the expression in one generated function
      // would otherwise redefine the same locals — Janino rejects the
      // whole function and the projection silently falls back to the
      // interpreter (the exact hot path this expression exists for).
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val body = if (elemType == StringType) {
        val cmp = ctx.freshName("cmp")
        s"""
        |int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
        |if ($cmp == 0) { $c++; $i++; $j++; } else if ($cmp < 0) $i++; else $j++;
        """.stripMargin
      } else {
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
        |long $xv = $a.getLong($i); long $yv = $b.getLong($j);
        |if ($xv == $yv) { $c++; $i++; $j++; } else if ($xv < $yv) $i++; else $j++;
        """.stripMargin
      }
      s"""
      |int $nx = $a.numElements(); int $ny = $b.numElements();
      |int $i = 0; int $j = 0; long $c = 0L;
      |while ($i < $nx && $j < $ny) {
      |  $body
      |}
      |${ev.value} = $c;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayExpressions {
  /** size(array_intersect(a, b)) for sorted distinct arrays, fused. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
