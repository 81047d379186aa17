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

/** SemDeDup: embedding-cluster semantic dedup. */
class SemDedupSpec extends SparkSpec {
  import graft.ops.Similarity

  private def vecs(rows: (Long, Array[Double])*) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2.toSeq)), 2), schema)
  }

  test("keeps the lowest id per duplicate pair, singletons survive") {
    // identical vectors are equidistant from every centroid, so each
    // duplicate pair always shares a cell whatever the quantizer does;
    // orthogonal directions keep non-pairs below any threshold
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    val mid = Array(0.0, 0.0, 1.0, 0.0)
    val d = vecs(0L -> e1, 1L -> e1, 2L -> e2, 3L -> e2, 4L -> mid)
    val got = Similarity.semDedup(d, 0.99, nLists = 2, lloydIters = 2)
      .orderBy(col("vec_id")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(0L -> true, 1L -> false, 2L -> true, 3L -> false, 4L -> true),
      s"got $got")
  }

  test("planted near-copies are dropped at >=80% (cluster recall gate)") {
    val rng = new scala.util.Random(7)
    val dim = 16
    val bases = (0 until 60).map(i =>
      i.toLong -> Array.fill(dim)(rng.nextGaussian()))
    // 30 near-copies of the first 30 bases (ids 1000+i): tiny noise →
    // cosine ≈ 1 with the base, almost always the same IVF cell
    val copies = (0 until 30).map(i =>
      (1000L + i) -> bases(i)._2.map(x => x + rng.nextGaussian() * 1e-4))
    val d = vecs((bases ++ copies): _*)
    val res = Similarity.semDedup(d, 0.999, nLists = 4)
    val droppedCopies = res.filter(col("vec_id") >= 1000L && !col("keep")).count()
    assert(droppedCopies >= 24, // >= 80% of 30; boundary cells may split a pair
      s"only $droppedCopies/30 planted duplicates were dropped")
    // bases never drop: no base pair reaches cos 0.999, and the copy has
    // the HIGHER id, so the survivor rule must keep every base
    assert(res.filter(col("vec_id") < 60L && !col("keep")).count() == 0)
  }

  test("deterministic across runs") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), graft.functions.Vec.toDouble(col("embedding")).as("v"))
    def run() = Similarity.semDedup(emb, 0.99, nLists = 8)
      .orderBy(col("vec_id")).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(run() == run())
  }
}
