package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Map-only document-sketch expressions.
  *
  * The groupBy formulation of MinHash/SimHash (explode elements → k-column
  * hash aggregate) shuffles one row per token/shingle — at 100 TB that is
  * the dominant cost of the whole dedup pipeline, and the k-wide
  * aggregate's fast-map allocates ~37 MB per task besides. These
  * expressions compute the same signatures in a single pass over the
  * per-document array: no explode, no shuffle, embarrassingly parallel,
  * and the signature stage pipelines into the band-bucketing shuffle that
  * LSH genuinely needs.
  *
  * Hash parameters match graft.ops.Dedup's aggregate formulation
  * bit-for-bit (universal hashing `(a_i·x + b_i) mod (2^31−1)` with
  * a_i = 2i+1, b_i = (40503·i + 10501) mod p; SimHash over xxhash64
  * with Spark's default seed 42).
  */
object SketchUtil {
  final val P: Long = 2147483647L // 2^31 - 1

  /** k-permutation MinHash over an array<long> of hashed shingles.
    * Returns null for empty arrays (docs with no shingles cannot collide
    * — same semantics as dropping out of the groupBy). */
  def minhash(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var e = 0
    while (e < n) {
      val x = arr.getLong(e)
      var i = 0
      while (i < k) {
        val a = 2L * i + 1
        val b = (i.toLong * 40503L + 10501L) % P
        val h = (a * x + b) % P
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over an array<string> of tokens (with multiplicity):
    * bit i is set iff Σ_tokens (2·bit_i(xxhash64(token)) − 1) > 0.
    * Returns null for empty arrays (no signal → no signature). */
  def simhash(arr: ArrayData): Any = {
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Int](64)
    var e = 0
    while (e < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(e), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      e += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }
}

/** MinHash signature of an array<long> of (already hashed) shingles. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any =
    SketchUtil.minhash(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val result = ctx.freshName("mh")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
      |org.apache.spark.sql.catalyst.util.GenericArrayData $result =
      |  graft.functions.SketchUtil.minhash($a, $numHashes);
      |if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string> of tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    SketchUtil.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val result = ctx.freshName("sh")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
      |Object $result = graft.functions.SketchUtil.simhash($a);
      |if ($result == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ((Long) $result).longValue(); }
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExpressions {
  def minhashSig(hashedShingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashedShingles), numHashes))

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
}
