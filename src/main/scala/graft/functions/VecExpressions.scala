package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`)
  * are CodegenFallback — every element evaluation goes through an
  * interpreted lambda, which profiled ~100× slower than a fused loop on
  * 64-dim embeddings. These expressions generate tight Java loops inside
  * whole-stage codegen instead (SURVEY.md §7.4 preference order: custom
  * `Expression` before UDF).
  *
  * Summation order is strictly sequential left-to-right, matching both
  * the higher-order-function formulation and DuckDB's
  * `list_inner_product`, so results are bit-identical to the oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName every local: with non-nullable inputs nullSafeCodeGen
      // inlines this block unscoped, and a second instance in the same
      // generated function would redefine `n`/`s` → Janino error →
      // silent whole-projection interpreter fallback.
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
      |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: one pass computes dot(a,b), dot(a,a),
  * dot(b,b) — a third of the traversals of the composed form, with each
  * accumulator still summed left-to-right (oracle-identical). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      s += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    s / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName every local — see DotProduct.doGenCode for why
      // (unscoped inlining under non-nullable inputs).
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0; double $na = 0.0; double $nb = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
      |  $s += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
      |}
      |${ev.value} = $s / java.lang.Math.sqrt($na * $nb);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket id: bit p of the result is set iff v · planes(p) > 0.
  * The hyperplane matrix rides along as a codegen reference object — not
  * as 6×64 literal CreateArray nodes per row, which bloat generated code
  * and janino compile time. */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(x.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * plane(i); i += 1 }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      // freshName every local — see DotProduct.doGenCode for why
      // (unscoped inlining under non-nullable inputs).
      val bucket = ctx.freshName("bucket"); val p = ctx.freshName("p")
      val plane = ctx.freshName("plane"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
      |long $bucket = 0L;
      |for (int $p = 0; $p < $planesRef.length; $p++) {
      |  double[] $plane = $planesRef[$p];
      |  int $n = java.lang.Math.min($a.numElements(), $plane.length);
      |  double $s = 0.0;
      |  for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $plane[$i]; }
      |  if ($s > 0) $bucket |= (1L << $p);
      |}
      |${ev.value} = $bucket;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helpers shared by interpreted eval and generated code. */
object VecUtil {
  /** Indices of the `nProbe` centroids nearest to `v` by squared L2,
    * ascending by distance (ties: lower index first). Selection over
    * k ≤ ~64 centroids — no allocation beyond the output. */
  def nearestCentroids(v: ArrayData, centroids: Array[Array[Double]],
                       nProbe: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = centroids.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val n = math.min(v.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) { val d = v.getDouble(i) - cent(i); s += d * d; i += 1 }
      dists(c) = s
      c += 1
    }
    val m = math.min(nProbe, k)
    val out = new Array[Long](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        if (!taken(j) && dists(j) < bestD) { best = j; bestD = dists(j) }
        j += 1
      }
      taken(best) = true
      out(r) = best.toLong
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** The `nProbe` nearest centroid ids (squared-L2, ascending) of a vector —
  * the assignment/probe step of an IVF index. The centroid matrix rides as
  * a codegen reference object, same pattern as LshBucket. */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
                            nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(a: Any): Any =
    VecUtil.nearestCentroids(a.asInstanceOf[ArrayData], centroids, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
      |${ev.value} = graft.functions.VecUtil.nearestCentroids(
      |  $a, $centsRef, $nProbe);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Morton (Z-order) code of two non-negative integral columns: the low
  * 32 bits of each are bit-interleaved (a in even positions, b in odd)
  * so lexicographic order on the code approximates locality in BOTH
  * dimensions at once. Range-partitioning + sorting by this code gives
  * every output file a compact 2-D bounding box → parquet min/max
  * skipping works for predicates on either column (one-axis range
  * clustering only serves its own axis). Bit-spreading uses the classic
  * magic-mask sequence — O(1), codegen-friendly, no loop. */
case class ZOrderCode(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // Declared input types make misuse (string/array args from SQL callers
  // of graft_zorder) fail at ANALYSIS time instead of as a runtime
  // ClassCastException in the interpreted path; integral narrower than
  // long coerces implicitly.
  // (AbstractDataType is private[sql] in Spark 4; the public subtype
  // DataType satisfies the override covariantly.)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.LongType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderCode.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
      |${ev.value} = graft.functions.ZOrderCode.interleave($a, $b);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderCode {
  /** Spread the low 32 bits of v so bit i lands at position 2i. */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Morton code: a's bits at even positions, b's at odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** N-ary Morton code: bit i of dimension j lands at position i*N + j,
    * using the low ⌊64/N⌋ bits of each value. N=2 takes the magic-mask
    * fast path; the general loop is ⌊64/N⌋·N ≤ 64 shift-or ops — still
    * branch-free per bit and trivially JIT-friendly. */
  def interleaveN(vals: Array[Long]): Long = {
    val k = vals.length
    if (k == 1) return vals(0)
    if (k == 2) return interleave(vals(0), vals(1))
    val bitsPer = 64 / k
    var out = 0L
    var i = 0
    while (i < bitsPer) {
      var j = 0
      while (j < k) {
        out |= ((vals(j) >>> i) & 1L) << (i * k + j)
        j += 1
      }
      i += 1
    }
    out
  }
}

/** N-dimensional Morton (Z-order) code (generalizes `ZOrderCode`): the
  * low ⌊64/N⌋ bits of each of N non-negative integral columns are
  * bit-interleaved, so lexicographic order on the code approximates
  * locality in ALL N dimensions — a clustered write on it gives every
  * file a compact N-D bounding box, and parquet min/max skipping then
  * serves range predicates on ANY of the columns. Precision per
  * dimension drops as ⌊64/N⌋ (21 bits at N=3, 16 at N=4): bucket or
  * rank-normalize wider domains upstream. */
case class ZOrderCodeN(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(children.size >= 1 && children.size <= 8,
    s"graft_zorder_n takes 1..8 columns, got ${children.size}")

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq.fill(children.size)(org.apache.spark.sql.types.LongType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_zorder_n"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < arr.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderCode.interleaveN(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"""
      |${e.code}
      |if (${e.isNull}) { ${ev.isNull} = true; }
      |else { $arr[$i] = ${e.value}; }
      """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long[] $arr = new long[${children.size}];
        |$fill
        |long ${ev.value} = 0L;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.ZOrderCode.interleaveN($arr);
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object VecExpressions {
  def dotNative(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def cosineNative(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def lshBucketNative(v: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(LshBucket(GraftBridge.expression(v), planes))

  def nearestCentroidsNative(v: Column, centroids: Array[Array[Double]],
                             nProbe: Int): Column =
    GraftBridge.column(NearestCentroids(
      GraftBridge.expression(v), centroids, nProbe))

  def zorderNative(a: Column, b: Column): Column =
    GraftBridge.column(ZOrderCode(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def zorderNativeN(cols: Column*): Column =
    GraftBridge.column(ZOrderCodeN(cols.map(GraftBridge.expression)))
}
