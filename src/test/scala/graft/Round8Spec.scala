package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TextAnalysis

/** Round-8 batch: n-gram LM quality scoring. */
class NgramLmSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  test("scores match hand computation (model, OOV, integral scaling)") {
    // reference (even ids): bigrams "a b"×2, "b c"×1, "b d"×1 → total 4
    // scored doc 1 "a b x": "a b" seen (2·1e6 div 4 = 500000), "b x" OOV
    // scored doc 3 "q":     <2 tokens → zero row must still surface
    val d = docs(
      0L -> "a b c",
      2L -> "a b d",
      1L -> "a b x",
      3L -> "q")
    val got = TextAnalysis.ngramLmScore(d, col("doc_id"), col("text"),
      col("doc_id") % 2 === 0)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 2L, 0L, 750000L), // "a b"=500000 + "b c"=250000
      (1L, 2L, 1L, 500000L), // "a b"=500000 + "b x" OOV
      (2L, 2L, 0L, 750000L), // "a b"=500000 + "b d"=250000
      (3L, 0L, 0L, 0L)       // <2 tokens, still surfaced
    ), s"got ${got.toSeq}")
  }

  test("reference docs score against the model they built (self-consistency)") {
    val d = docs(0L -> "x y x y", 2L -> "x y")
    // model: "x y"×3, "y x"×1 → total 4
    val got = TextAnalysis.ngramLmScore(d, col("doc_id"), col("text"), lit(true))
      .orderBy(col("doc_id")).collect()
    // doc0: 3 bigrams: x y, y x, x y → 750000+250000+750000 = 1750000
    assert(got(0).getLong(1) == 3L && got(0).getLong(2) == 0L &&
      got(0).getLong(3) == 1750000L)
    assert(got(1).getLong(1) == 1L && got(1).getLong(3) == 750000L)
  }

  test("empty reference slice: every instance is OOV with zero score") {
    val d = docs(1L -> "a b c", 3L -> "a b")
    val got = TextAnalysis.ngramLmScore(d, col("doc_id"), col("text"), lit(false))
      .orderBy(col("doc_id")).collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((2L, 2L, 0L), (1L, 1L, 0L)))
  }
}
