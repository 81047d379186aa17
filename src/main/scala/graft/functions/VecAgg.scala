package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Partial-aggregation buffer: element-wise running sums + row count. */
case class VecMeanBuf(sums: Array[Double], n: Long)

/** Element-wise mean of `array<double>` vectors — embedding pooling
  * (centroid of a document/cluster group).
  *
  * A typed `Aggregator` rather than explode+groupBy(pos): Spark executes
  * it as an ObjectHashAggregate with map-side partial merge, so each
  * partition contributes ONE dim-length partial per group instead of
  * shuffling n×dim exploded rows — at 100 TB the difference between
  * shuffling kilobytes and shuffling the corpus. Mixed-length vectors
  * take the max length (missing tail elements contribute 0 to the sum
  * but are divided by the global n — callers should feed fixed-dim
  * embeddings, which is the data contract of an embedding column).
  */
class VecMean extends Aggregator[Seq[Double], VecMeanBuf, Seq[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(Array.emptyDoubleArray, 0L)

  private def addInto(acc: Array[Double], v: Seq[Double]): Array[Double] = {
    val out = if (acc.length >= v.length) acc
              else java.util.Arrays.copyOf(acc, v.length)
    var i = 0
    v.foreach { x => out(i) += x; i += 1 }
    out
  }

  private def addArray(acc: Array[Double], v: Array[Double]): Array[Double] = {
    val out = if (acc.length >= v.length) acc
              else java.util.Arrays.copyOf(acc, v.length)
    var i = 0
    while (i < v.length) { out(i) += v(i); i += 1 }
    out
  }

  override def reduce(b: VecMeanBuf, a: Seq[Double]): VecMeanBuf =
    if (a == null) b else VecMeanBuf(addInto(b.sums, a), b.n + 1)

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf =
    VecMeanBuf(addArray(x.sums, y.sums), x.n + y.n)

  override def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0) null else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: ExpressionEncoder[VecMeanBuf] =
    ExpressionEncoder[VecMeanBuf]()
  override def outputEncoder: ExpressionEncoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

/** Bounded top-k of (score, id) pairs: keep the k largest by
  * (score DESC, id ASC). The unique (score, id) total order makes the
  * result independent of arrival/merge order — safe under partial
  * aggregation.
  *
  * Why an Aggregator and not row_number() over a window: the window
  * formulation shuffles EVERY scored pair to the query's partition
  * before ranking; this one reduces each map partition to ≤ k pairs
  * first, so the shuffle carries k × partitions rows per query instead
  * of the full candidate set — the difference between shuffling
  * kilobytes and shuffling the corpus at 100 TB fan-outs.
  */
class TopKPairs(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  private def trim(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.sorted(ord).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    val grown = b :+ a
    if (grown.length >= 4 * k) trim(grown) else grown // amortized trim
  }

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(x ++ y)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(b)

  override def bufferEncoder: ExpressionEncoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: ExpressionEncoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object VecAgg {
  /** DataFrame-callable element-wise mean over an array<double> column. */
  val vecMean: UserDefinedFunction = udaf(new VecMean, ExpressionEncoder[Seq[Double]]())

  /** Map-side-partial top-k of struct(score, id) — see TopKPairs. */
  def topKPairs(k: Int): UserDefinedFunction =
    udaf(new TopKPairs(k), ExpressionEncoder[(Double, Long)]())
}
