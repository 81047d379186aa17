package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.ZOrderCode
import graft.ops.{Relational, Sampling}

/** Property-based checks: the invariants that must hold for ANY input,
  * not just the fixtures — randomized inputs catch the edge shapes
  * hand-written cases miss (empty keys, all-ties timestamps, single-row
  * sides). Pure functions get full scalacheck volume; Spark round trips
  * use fewer, larger cases. */
class PropertySpec extends SparkSpec {

  /** Offline env ships scalacheck but not the scalatest bridge — drive
    * generators manually: sample n values, run the property on each. */
  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(n).foreach { s =>
      body(gen.pureApply(Gen.Parameters.default, s))
    }
  }
  import spark.implicits._

  // ------------------------------------------------------- pure functions

  test("zorder interleave is monotone per dimension and collision-free") {
    forSamples(Gen.zip(Gen.choose(0L, 0xFFFFFFFFL), Gen.choose(0L, 0xFFFFFFFFL)), 200) {
      case (a: Long, b: Long) =>
        val z = ZOrderCode.interleave(a, b)
        // de-interleave recovers both inputs exactly (collision-free)
        def compact(v: Long): Long = {
          var x = v & 0x5555555555555555L
          x = (x | (x >> 1)) & 0x3333333333333333L
          x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
          x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
          x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
          x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
          x
        }
        assert(compact(z) == a && compact(z >> 1) == b)
        // growing one dimension never shrinks the code
        if (a < 0xFFFFFFFFL) assert(ZOrderCode.interleave(a + 1, b) > (z ^ 1L) - 2)
    }
  }

  test("fingerprint stays within the modulus for any token list") {
    val docs = Gen.listOfN(5, Gen.listOfN(8, Gen.alphaNumStr)).sample.get
    val df = docs.map(_.mkString(" ")).toDF("text")
      .withColumn("fp", graft.ops.TextAnalysis.fingerprint(split(col("text"), " ")))
    df.select("fp").as[Long].collect().foreach { fp =>
      assert(fp >= 0L && fp < 2147483647L)
    }
  }

  // --------------------------------------------------- spark round trips

  test("asOfJoinNative equals the naive min-candidate join on random inputs") {
    forSamples(Gen.choose(1, 4), 3) { seed: Int =>
      val rnd = new scala.util.Random(seed)
      val left = (1 to 120).map(_ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(300).toLong)).toDF("k", "ts")
      val right = (1 to 80).map(_ =>
        (rnd.nextInt(10).toLong, rnd.nextInt(300).toLong))
        .map { case (k, t) => (k, t, t) }.toDF("k", "ts", "v")
      val native = graft.plans.AsOfJoin.asOfJoinNative(left, right, "k", "ts", Seq("v"))
        .select("k", "ts", "asof_v").as[(Long, Long, Option[Long])]
        .collect().sorted.toSeq
      val naive = left.as("l")
        .join(right.select(col("k"), col("ts").as("rts")).as("r"),
          col("l.k") === col("r.k") && col("rts") <= col("l.ts"), "left")
        .groupBy(col("l.k").as("k"), col("l.ts").as("ts"))
        .agg(max(col("rts")).as("m"))
        .select("k", "ts", "m").as[(Long, Long, Option[Long])]
        .collect().sorted.toSeq
      // naive dedups (k, ts); compare on the deduped view
      assert(native.distinct == naive)
    }
  }

  test("deterministic sample of a union is the union of the samples") {
    forSamples(Gen.choose(0L, 10000L), 3) { offset: Long =>
      val a = ((offset + 1) to (offset + 300)).toDF("id")
      val b = ((offset + 301) to (offset + 600)).toDF("id")
      val whole = Sampling.deterministicSample(a.union(b), col("id"), "40000000")
        .as[Long].collect().toSet
      val parts = Sampling.deterministicSample(a, col("id"), "40000000")
        .as[Long].collect().toSet ++
        Sampling.deterministicSample(b, col("id"), "40000000")
          .as[Long].collect().toSet
      assert(whole == parts)
    }
  }

  test("sessionize session count is 1 + number of over-gap steps, per key") {
    forSamples(Gen.choose(1, 3), 3) { seed: Int =>
      val rnd = new scala.util.Random(seed)
      val events = (1 to 150).map { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(2000).toLong * 1000L, i.toLong)
      }.toDF("k", "ts_us", "eid")
      val got = Relational.sessionize(events, col("k"), col("ts_us"),
        col("eid"), gapMicros = 100000L)
        .groupBy(col("k")).agg(max(col("session_id")).as("n"))
        .as[(Long, Long)].collect().toMap
      // naive per-key scan
      val rows = events.as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues { es =>
          val ts = es.sortBy(e => (e._2, e._3)).map(_._2).toSeq
          1L + ts.sliding(2).count {
            case Seq(p, n) => n - p > 100000L
            case _ => false
          }
        }.toMap
      assert(got == rows)
    }
  }
}
