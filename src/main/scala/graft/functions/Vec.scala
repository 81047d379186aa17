package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (no UDFs — stays inside whole-stage
  * codegen, SURVEY.md §7.4).
  *
  * Numeric discipline: elements are widened float→double BEFORE any
  * multiply (float multiplies lose bits an oracle can't reproduce), and
  * the cosine is computed as dot/sqrt(normSq_a * normSq_b) — one sqrt,
  * matching the oracle formula exactly so both engines run the identical
  * IEEE op sequence.
  */
object Vec {
  /** Widen an array<float> to array<double> (plain Cast — codegen'd). */
  def toDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential left-to-right dot product in double space (native
    * codegen'd loop — see VecExpressions). */
  def dot(a: Column, b: Column): Column = VecExpressions.dotNative(a, b)

  /** Reference higher-order-function dot product: bit-identical to
    * `dot`, but interpreted (CodegenFallback). Kept for differential
    * testing of the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity of two array<double> columns: fused single-pass
    * native loop computing dot + both norms (VecExpressions.CosineSim). */
  def cosine(a: Column, b: Column): Column = VecExpressions.cosineNative(a, b)

  /** Cosine rounded to 6 dp: rank/compare on this across engines so
    * sub-ulp differences in summation order can never flip an ordering. */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)
}
