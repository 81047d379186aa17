package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** Round-9 regression gate for the codegen name-collision bug.
  *
  * `nullSafeCodeGen` inlines the expression template WITHOUT a scoping
  * block when the inputs are non-nullable (the nullIntolerant fast
  * path). A `doGenCode` template that declares fixed local names
  * (`int i`, `double s`, ...) then compiles fine alone but fails with
  * Janino "Redefinition of local variable" the moment TWO instances of
  * the expression land in ONE generated function (projection collapse
  * does this routinely, e.g. the q32 jaccard projection) — and Spark
  * silently falls back to the INTERPRETED projection, forfeiting the
  * entire point of the native expression.
  *
  * This spec instantiates every native graft expression TWICE over
  * non-nullable inputs in one `GenerateUnsafeProjection` — which, unlike
  * `UnsafeProjection.create`, throws on compile failure instead of
  * falling back — and cross-checks the generated values against
  * interpreted eval.
  */
class CodegenCollisionSpec extends SparkSpec {

  private def arr(tpe: DataType) = ArrayType(tpe, containsNull = false)

  /** Compile exprs (duplicated) into one generated projection — throws on
    * any Janino error — then check generated == interpreted on `row`. */
  private def assertCompilesDoubled(exprs: Seq[Expression], row: InternalRow): Unit = {
    val doubled = exprs ++ exprs.map(_.mapChildren(identity)) // two instances each
    val proj = GenerateUnsafeProjection.generate(doubled)
    val out = proj(row)
    doubled.zipWithIndex.foreach { case (e, i) =>
      val interpreted = e.eval(row)
      val generated = out.get(i, e.dataType)
      (interpreted, generated) match {
        case (a: GenericArrayData, b: org.apache.spark.sql.catalyst.util.ArrayData) =>
          assert(a.array.toSeq == b.toSeq[Any](
            e.dataType.asInstanceOf[ArrayType].elementType).toSeq)
        case (a, b) => assert(a == b, s"expr $i ($e): $a != $b")
      }
    }
  }

  private val dvec = new GenericArrayData(Array(1.0, -2.0, 0.5, 3.0))
  private val lvecA = new GenericArrayData(Array(1L, 3L, 5L, 9L))
  private val lvecB = new GenericArrayData(Array(3L, 4L, 9L))
  private val svecA = new GenericArrayData(
    Array("a", "c", "e").map(UTF8String.fromString(_).asInstanceOf[Any]))
  private val svecB = new GenericArrayData(
    Array("b", "c", "e").map(UTF8String.fromString(_).asInstanceOf[Any]))

  test("two SortedIntersectCount instances (long + string) compile in one projection") {
    val la = BoundReference(0, arr(LongType), nullable = false)
    val lb = BoundReference(1, arr(LongType), nullable = false)
    val sa = BoundReference(2, arr(StringType), nullable = false)
    val sb = BoundReference(3, arr(StringType), nullable = false)
    assertCompilesDoubled(
      Seq(SortedIntersectCount(la, lb), SortedIntersectCount(sa, sb)),
      InternalRow(lvecA, lvecB, svecA, svecB))
  }

  test("two DotProduct + two CosineSim instances compile in one projection") {
    val a = BoundReference(0, arr(DoubleType), nullable = false)
    val b = BoundReference(1, arr(DoubleType), nullable = false)
    assertCompilesDoubled(
      Seq(DotProduct(a, b), CosineSim(a, b)),
      InternalRow(dvec, dvec))
  }

  test("two LshBucket + two NearestCentroids instances compile in one projection") {
    val a = BoundReference(0, arr(DoubleType), nullable = false)
    val planes = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, -1.0, 0.0, 0.0))
    val cents = Array(Array(0.0, 0.0, 0.0, 0.0), Array(2.0, -2.0, 1.0, 2.0))
    assertCompilesDoubled(
      Seq(LshBucket(a, planes), NearestCentroids(a, cents, 2)),
      InternalRow(dvec))
  }

  test("two NfcNormalize instances compile in one projection") {
    val s = BoundReference(0, StringType, nullable = false)
    assertCompilesDoubled(
      Seq(NfcNormalize(s)),
      InternalRow(UTF8String.fromString("café até")))
  }

  test("two MinHashSig + SimHash64 + ZOrderCode(N) + IcebergBucket instances compile") {
    val lv = BoundReference(0, arr(LongType), nullable = false)
    val sv = BoundReference(1, arr(StringType), nullable = false)
    val k1 = BoundReference(2, LongType, nullable = false)
    val k2 = BoundReference(3, LongType, nullable = false)
    val st = BoundReference(4, StringType, nullable = false)
    assertCompilesDoubled(
      Seq(MinHashSig(lv, 8), SimHash64(sv), ZOrderCode(k1, k2),
        ZOrderCodeN(Seq(k1, k2, k1)), IcebergBucket(k1, 16), IcebergBucket(st, 16)),
      InternalRow(lvecA, svecA, 42L, 7L, UTF8String.fromString("part-key")))
  }

  test("two CmsEstimateLong + BloomMightContainLong instances compile") {
    val sc = spark.sparkContext
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(0.01, 0.01, 7)
    cms.addLong(42L); cms.addLong(42L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    bloom.putLong(42L)
    val k = BoundReference(0, LongType, nullable = false)
    assertCompilesDoubled(
      Seq(CmsEstimateLong(sc.broadcast(cms), k),
        BloomMightContainLong(sc.broadcast(bloom), k)),
      InternalRow(42L))
  }

  test("the q32-shape jaccard projection runs without interpreter fallback") {
    // End-to-end shape of the original failure: a projection holding the
    // SAME SortedIntersectCount twice (numerator + inside the union-size
    // denominator) over non-nullable sorted arrays, as projection
    // collapse produces in Dedup.minhashNearDuplicates.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Seq(1L, 3L, 5L), Seq(3L, 5L, 7L))).toDF("a", "b")
      .select($"a", $"b",
        ArrayExpressions.sortedIntersectCount($"a", $"b").as("inter"))
      .select(($"inter".cast("double") /
        (size($"a") + size($"b") - ArrayExpressions.sortedIntersectCount($"a", $"b"))
      ).as("jaccard"))
    assert(df.as[Double].head() == 0.5)
  }
}
