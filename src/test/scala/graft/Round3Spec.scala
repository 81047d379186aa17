package graft

import org.apache.spark.sql.functions._

import graft.ops.{Relational, Sampling, TextAnalysis}

class AsofForwardSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoinForward picks the earliest right row at-or-after each left ts") {
    val views = Seq((1L, 100L), (1L, 20L), (1L, 300L), (2L, 10L))
      .toDF("k", "ts")
    val clicks = Seq((1L, 100L, 100L), (1L, 150L, 150L), (1L, 40L, 40L),
      (3L, 5L, 5L)).toDF("k", "ts", "click_ts")
    val got = Relational.asOfJoinForward(views, clicks, "k", "ts", Seq("click_ts"))
      .select("k", "ts", "asof_click_ts").as[(Long, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 20L, Some(40L)),    // earliest click after 20 is 40
      (1L, 100L, Some(100L)),  // inclusive: equal ts matches
      (1L, 300L, None),        // nothing after 300
      (2L, 10L, None)))        // no clicks for key 2
  }

  test("asOfJoinForward equals a naive min-over-candidates formulation") {
    val views = (1 to 200).map(i => ((i % 7).toLong, (i * 13 % 500).toLong))
      .toDF("k", "ts")
    val clicks = (1 to 100).map(i => ((i % 5).toLong, (i * 31 % 500).toLong))
      .map { case (k, t) => (k, t, t) }.toDF("k", "ts", "click_ts")
    val got = Relational.asOfJoinForward(views, clicks, "k", "ts", Seq("click_ts"))
      .groupBy()
      .agg(count(lit(1)), count(col("asof_click_ts")),
        sum(col("asof_click_ts")))
      .as[(Long, Long, Option[Long])].head()
    val naive = views.as("v")
      .join(clicks.select(col("k"), col("ts").as("cts")).as("c"),
        col("v.k") === col("c.k") && col("cts") >= col("v.ts"), "left")
      .groupBy(col("v.k").as("k"), col("v.ts").as("ts"))
      .agg(min(col("cts")).as("m"))
      .groupBy()
      .agg(count(lit(1)), count(col("m")), sum(col("m")))
      .as[(Long, Long, Option[Long])].head()
    assert(got == naive)
  }
}

class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrefilterJoin equals the plain join exactly") {
    val fact = (1L to 2000L).map(i => (i % 400, i)).toDF("fk", "id")
    val dim = Seq(3L, 7L, 11L, 399L).map(k => (k, s"d$k")).toDF("dk", "tag")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "id", "tag").as[(Long, Long, String)].collect().toSet
    val bloomed = Relational.bloomPrefilterJoin(fact, dim, "fk", "dk",
      expectedDimKeys = 1000L)
      .select("fk", "id", "tag").as[(Long, Long, String)].collect().toSet
    assert(bloomed == plain)
    assert(plain.size == 4 * 5) // 2000/400 rows per key
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicSample is stable across repartitioning and subsetting") {
    val df = (1L to 1000L).toDF("id")
    val a = Sampling.deterministicSample(df, col("id"), "29000000")
      .as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(13), col("id"), "29000000")
      .as[Long].collect().toSet
    assert(a == b)
    // a row's keep-decision is independent of the rest of the dataset
    val c = Sampling.deterministicSample(df.filter(col("id") <= 500),
      col("id"), "29000000").as[Long].collect().toSet
    assert(c == a.filter(_ <= 500L))
    // ~16% of 16^8 space; loose band to stay deterministic-but-sane
    assert(a.size > 100 && a.size < 230)
  }

  test("hashSplit: disjoint cover, stable under growth, fractions land") {
    val df = (1L to 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.hashSplit(df, col("id"), splits)
      .as[(Long, String)].collect().toMap
    // every row in exactly one bucket
    assert(got.size == 2000)
    val sizes = got.values.groupBy(identity).map { case (k, v) => k -> v.size }
    // loose bands (deterministic, so these never flake)
    assert(sizes("train") > 1500 && sizes("train") < 1700, sizes.toString)
    assert(sizes("val") > 120 && sizes("val") < 280, sizes.toString)
    assert(sizes("test") > 120 && sizes("test") < 280, sizes.toString)
    // the leakage guarantee: growing the dataset never moves a row
    val grown = Sampling.hashSplit((1L to 4000L).toDF("id"), col("id"),
      splits).as[(Long, String)].collect().toMap
    got.foreach { case (id, s) => assert(grown(id) == s,
      s"row $id moved from $s to ${grown(id)} when the corpus grew") }
    // and repartitioning changes nothing
    val reparted = Sampling.hashSplit(df.repartition(17), col("id"), splits)
      .as[(Long, String)].collect().toMap
    assert(reparted == got)
    intercept[IllegalArgumentException](
      Sampling.hashSplit(df, col("id"), Seq("a" -> 0.5, "b" -> 0.2)))
  }

  test("hashSplit: a cumulative fraction reaching 1.0 clamps inside the hex space") {
    // trailing ~0 fraction → the second threshold is floor(1.0 * 16^8),
    // which unclamped formats as the 9-char '100000000' and sorts BELOW
    // every hash not starting with '0' — sending ~half the corpus to
    // the empty bucket. Clamped to 'ffffffff' it stays 8 hex chars.
    val df = (1L to 2000L).toDF("id")
    val got = Sampling.hashSplit(df, col("id"),
      Seq("a" -> 0.5, "b" -> 0.5, "c" -> 0.0))
      .as[(Long, String)].collect().toMap
    assert(got.size == 2000)
    val sizes = got.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(sizes("a") > 900 && sizes("a") < 1100, sizes.toString)
    assert(sizes.getOrElse("b", 0) > 900 && sizes.getOrElse("b", 0) < 1100,
      sizes.toString)
    assert(sizes.getOrElse("c", 0) <= 1, sizes.toString)
  }

  test("stratifiedSample returns exactly min(n, stratum size) rows per stratum") {
    val df = (1L to 95L).map(i => (s"s${i % 3}", i)).toDF("g", "id")
    val got = Sampling.stratifiedSample(df, Seq(col("g")), col("id"), 10)
    val sizes = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L))
    val small = Sampling.stratifiedSample(df.filter(col("id") <= 5),
      Seq(col("g")), col("id"), 10)
    assert(small.count() == 5)
  }
}

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopTerms ranks rare-but-frequent terms first") {
    val docs = Seq(
      (1L, "apple apple apple common"),
      (2L, "banana common common"),
      (3L, "common cherry")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, col("doc_id"), col("text"), 2)
      .select("doc_id", "rnk", "term", "tf", "dfreq")
      .as[(Long, Long, String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // doc 1: apple tf=3 df=1 → score 9; common tf=1 df=3 → score 1
    assert(got(0) == (1L, 1L, "apple", 3L, 1L))
    assert(got(1) == (1L, 2L, "common", 1L, 3L))
    // doc 3: cherry (tf=1, df=1, score 3) beats common (score 1)
    assert(got.filter(_._1 == 3L).map(_._3) == Seq("cherry", "common"))
  }

  test("tfidf scores are exact IEEE doubles (no log)") {
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val scores = TextAnalysis.tfidfTopTerms(docs, col("doc_id"), col("text"), 3)
      .select("term", "score").as[(String, Double)].collect().toMap
    assert(scores("x") == 1.0) // tf=1 * (2/2)
    assert(scores("y") == 2.0) // tf=1 * (2/1)
  }
}

class HoppingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("hoppingTypeStats assigns each event to windowLen/slide windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    mem.addData(
      (java.sql.Timestamp.valueOf("2020-01-01 00:07:30"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2020-01-01 00:12:30"), "click", 3.0))
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val out = graft.streaming.EventStreams.drainAvailableNow(
      graft.streaming.EventStreams.hoppingTypeStats(stream))
      .select(col("window_start").cast("string"), col("event_type"),
        col("n_events"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().sortBy(_._1).toSeq
    // 00:07:30 → windows starting 00:00 and 00:05;
    // 00:12:30 → windows starting 00:05 and 00:10.
    assert(out == Seq(
      ("2020-01-01 00:00:00", "click", 1L, 2.0),
      ("2020-01-01 00:05:00", "click", 2L, 5.0),
      ("2020-01-01 00:10:00", "click", 1L, 3.0)))
  }
}

class Scd2Spec extends SparkSpec {
  import spark.implicits._
  import graft.pipeline.Medallion

  test("scd2FromHistory collapses to change points with correct validity") {
    val h = Seq(
      (1L, 10L, 1L, "bronze"), (1L, 20L, 2L, "bronze"), // no-op repeat
      (1L, 30L, 3L, "silver"), (1L, 40L, 4L, "gold"),
      (2L, 15L, 5L, "bronze")).toDF("k", "ts", "eid", "tier")
    val got = Medallion.scd2FromHistory(h, Seq("k"), "ts", "eid", Seq("tier"))
      .select("k", "tier", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "bronze", 15L, None, true)))
  }

  test("scd2Apply closes changed versions, appends new, ignores no-ops") {
    val dim = Seq(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "silver", 30L, None, true),
      (2L, "bronze", 15L, None, true))
      .toDF("k", "tier", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "gold", 50L),   // real change
      (2L, "bronze", 60L)) // no-op: same tier as current
      .toDF("k", "tier", "eff_ts")
    val got = Medallion.scd2Apply(dim, updates, Seq("k"), Seq("tier"), "eff_ts")
      .select("k", "tier", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(50L), false),
      (1L, "gold", 50L, None, true),
      (2L, "bronze", 15L, None, true)))
  }
}

class IncrementalGoldSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("streamIncrementalGold over micro-batches equals the batch aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gold = "/tmp/graft_test_gold"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(gold))
    val mem = MemoryStream[(String, Double)]
    mem.addData(("a", 1.5), ("b", 2.0), ("a", 0.25))
    graft.streaming.EventStreams.streamIncrementalGold(
      mem.toDF().toDF("k", "v"), "k", "v", gold)
    // second batch merges into the existing gold table
    val mem2 = MemoryStream[(String, Double)]
    mem2.addData(("a", 10.0), ("c", 7.0))
    graft.streaming.EventStreams.streamIncrementalGold(
      mem2.toDF().toDF("k", "v"), "k", "v", gold)
    val got = spark.read.parquet(gold)
      .select(col("k"), col("n_events"),
        col("sum_value_dec").cast("double").as("s"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 3L, 11.75), ("b", 1L, 2.0), ("c", 1L, 7.0)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(gold))
  }
}

class ClusteredWriteSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("writeClustered produces files with disjoint key ranges") {
    val path = "/tmp/graft_test_clustered"
    val df = (1L to 10000L).map(i => (i * 7919 % 10000, i)).toDF("key", "id")
    graft.pipeline.Medallion.writeClustered(df, path, Seq("key"), 8)
    val files = spark.read.parquet(path).inputFiles
    assert(files.length == 8)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("key")), max(col("key")))
        .as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2) // disjoint + ordered
      case _ =>
    }
    // nothing lost in the re-layout
    assert(spark.read.parquet(path).count() == 10000)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }
}

class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._
  import graft.plans.AsOfJoin

  private def randomSides(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val left = (1 to 500).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "ts")
    val right = (1 to 300).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong))
      .map { case (k, t) => (k, t, k * 100000 + t) }
      .toDF("k", "ts", "v")
    (left, right)
  }

  test("native backward as-of equals the union+window formulation") {
    val (left, right) = randomSides(42)
    val native = AsOfJoin.asOfJoinNative(left, right, "k", "ts", Seq("v"))
      .select("k", "ts", "asof_v").as[(Long, Long, Option[Long])]
      .collect().sorted.toSeq
    val composed = graft.ops.Relational.asOfJoin(left, right, "k", "ts", Seq("v"))
      .select("k", "ts", "asof_v").as[(Long, Long, Option[Long])]
      .collect().sorted.toSeq
    assert(native == composed)
    assert(native.exists(_._3.isDefined) && native.exists(_._3.isEmpty))
  }

  test("native forward as-of equals the union+window formulation") {
    val (left, right) = randomSides(7)
    val native = AsOfJoin.asOfJoinNative(left, right, "k", "ts", Seq("v"),
      forward = true)
      .select("k", "ts", "asof_v").as[(Long, Long, Option[Long])]
      .collect().sorted.toSeq
    val composed = graft.ops.Relational.asOfJoinForward(left, right, "k", "ts", Seq("v"))
      .select("k", "ts", "asof_v").as[(Long, Long, Option[Long])]
      .collect().sorted.toSeq
    assert(native == composed)
  }

  test("native as-of join handles a self-join (conflicting ExprIds)") {
    val events = Seq((1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "view"))
      .toDF("k", "ts", "typ")
    val views = events.filter(col("typ") === "view")
    val clicks = events.filter(col("typ") === "click")
      .select(col("k"), col("ts"), col("ts").as("cts"))
    val got = AsOfJoin.asOfJoinNative(views, clicks, "k", "ts", Seq("cts"))
      .select("ts", "asof_cts").as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, None), (30L, Some(20L))))
  }

  test("native as-of plans one exchange per side and streams the merge") {
    val (left, right) = randomSides(3)
    val df = AsOfJoin.asOfJoinNative(left, right, "k", "ts", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected <=3 exchange mentions, got:\n$plan")
  }
}

class VersionedSnapshotSpec extends SparkSpec {
  import spark.implicits._
  import graft.pipeline.Medallion

  test("writeVersioned commits isolated snapshots; readVersion time-travels") {
    val base = "/tmp/graft_test_versions"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val v1 = Medallion.writeVersioned(Seq((1, "a"), (2, "b")).toDF("id", "x"), base)
    val v2 = Medallion.writeVersioned(Seq((1, "a2"), (3, "c")).toDF("id", "x"), base)
    assert((v1, v2) == (1, 2))
    assert(Medallion.currentVersion(base).contains(2))
    assert(Medallion.readVersion(spark, base, Some(1))
      .as[(Int, String)].collect().sortBy(_._1).toSeq == Seq((1, "a"), (2, "b")))
    assert(Medallion.readVersion(spark, base)
      .as[(Int, String)].collect().sortBy(_._1).toSeq == Seq((1, "a2"), (3, "c")))
    val v3 = Medallion.writeVersioned(Seq((9, "z")).toDF("id", "x"), base)
    assert(Medallion.vacuumVersions(base, keep = 2) == 1)
    assert(Medallion.currentVersion(base).contains(3))
    // dropped version is gone, retained ones still readable
    intercept[Exception] { Medallion.readVersion(spark, base, Some(1)).collect() }
    assert(Medallion.readVersion(spark, base, Some(2)).count() == 2)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}

class RangeJoinBinningSpec extends SparkSpec {
  import spark.implicits._
  import graft.plans.RangeJoinBinning

  private lazy val clicks = (1 to 300).map(i =>
    (i.toLong, (i * 97 % 5000).toLong)).toDF("cid", "cts")
  private lazy val views = (1 to 400).map(i =>
    (i.toLong, (i * 61 % 5000).toLong)).toDF("vid", "vts")

  private def naive = clicks.join(views,
    col("vts") <= col("cts") && col("vts") > col("cts") - 200L)

  test("binned rewrite preserves the band-join result exactly") {
    val before = naive.select("cid", "vid").as[(Long, Long)].collect().toSet
    RangeJoinBinning.enable(spark)
    val after = naive.select("cid", "vid").as[(Long, Long)].collect().toSet
    assert(after == before)
    assert(after.nonEmpty)
  }

  test("binned rewrite replaces the nested-loop join with an equi join") {
    RangeJoinBinning.enable(spark)
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"expected equi join after rewrite, got:\n$plan")
    // the rewrite must NOT fire on joins that already have an equi key
    val equi = clicks.join(views, col("cid") === col("vid") &&
      col("vts") <= col("cts") && col("vts") > col("cts") - 200L)
    assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
  }
}

class DedupWatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("dedupWithinWatermark suppresses in-horizon duplicates and bounds state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    mem.addData(
      (java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2020-01-01 00:01:00"), 1L), // dup in horizon
      (java.sql.Timestamp.valueOf("2020-01-01 00:02:00"), 2L))
    val out = graft.streaming.EventStreams.drainAvailableNow(
      graft.streaming.EventStreams.dedupWithinWatermark(
        mem.toDF().toDF("ts", "k"), Seq("k"), "ts", "10 minutes"),
      mode = "append")
    assert(out.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.ZOrderCode

  test("interleave puts a's bits at even and b's at odd positions") {
    assert(ZOrderCode.interleave(0L, 0L) == 0L)
    assert(ZOrderCode.interleave(1L, 0L) == 1L)        // bit 0
    assert(ZOrderCode.interleave(0L, 1L) == 2L)        // bit 1
    assert(ZOrderCode.interleave(3L, 3L) == 15L)       // 0b1111
    assert(ZOrderCode.interleave(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(ZOrderCode.interleave(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
  }

  test("native expression matches the scala implementation under codegen") {
    val df = (0L until 1000L).map(i => (i * 7 % 97, i * 13 % 89)).toDF("a", "b")
    val got = df.select(
      graft.functions.VecExpressions.zorderNative(col("a"), col("b")).as("z"),
      col("a"), col("b"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (z, a, b) => assert(z == ZOrderCode.interleave(a, b)) }
  }

  test("interleaveN: 3-ary bit placement, 2-ary fast-path parity, per-dimension monotonicity") {
    // bit i of dim j lands at position i*3 + j
    assert(ZOrderCode.interleaveN(Array(1L, 0L, 0L)) == 1L)
    assert(ZOrderCode.interleaveN(Array(0L, 1L, 0L)) == 2L)
    assert(ZOrderCode.interleaveN(Array(0L, 0L, 1L)) == 4L)
    assert(ZOrderCode.interleaveN(Array(3L, 0L, 0L)) == 9L)   // bits 0,3
    assert(ZOrderCode.interleaveN(Array(7L, 7L, 7L)) == 511L) // 0b111111111
    // N=2 must hit the magic-mask fast path with identical results
    for (a <- Seq(0L, 1L, 5L, 1234567L); b <- Seq(0L, 2L, 999L))
      assert(ZOrderCode.interleaveN(Array(a, b)) == ZOrderCode.interleave(a, b))
    // growing one dimension (others fixed) never decreases the code
    val base = ZOrderCode.interleaveN(Array(10L, 20L, 30L))
    assert(ZOrderCode.interleaveN(Array(11L, 20L, 30L)) > base - 1)
    assert(ZOrderCode.interleaveN(Array(10L, 21L, 30L)) > base - 1)
  }

  test("native N-ary expression matches scala under codegen, including null propagation") {
    val df = (0L until 500L).map(i => (i * 7 % 61, i * 13 % 53, i * 17 % 47))
      .toDF("a", "b", "c")
    val got = df.select(
      graft.functions.VecExpressions.zorderNativeN(col("a"), col("b"), col("c")).as("z"),
      col("a"), col("b"), col("c"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (z, a, b, c) =>
      assert(z == ZOrderCode.interleaveN(Array(a, b, c))) }
    val withNull = Seq((Some(1L), Option.empty[Long], Some(2L)))
      .toDF("a", "b", "c")
      .select(graft.functions.VecExpressions
        .zorderNativeN(col("a"), col("b"), col("c")).as("z"))
      .as[Option[Long]].head()
    assert(withNull.isEmpty, "null input must yield null code")
  }

  test("3-D z-ordered layout skips files on ALL THREE dimensions") {
    val path = "/tmp/graft_test_zorder3"
    val df = (1L to 60000L).map(i =>
      (i % 64, (i * 31) % 64, (i * 47) % 64, i)).toDF("a", "b", "c", "id")
    graft.pipeline.Medallion.writeZOrderedN(df, path, Seq("a", "b", "c"), 16)
    val files = spark.read.parquet(path).inputFiles
    assert(files.length == 16)
    val boxes = files.map { f =>
      spark.read.parquet(f).agg(
        min(col("a")), max(col("a")), min(col("b")), max(col("b")),
        min(col("c")), max(col("c")))
        .as[(Long, Long, Long, Long, Long, Long)].head()
    }
    // a corner query on each single dimension AND the 3-D corner: a
    // one-axis sort could only ever serve its own axis
    val cornerHit = boxes.count { case (aLo, _, bLo, _, cLo, _) =>
      aLo < 16 && bLo < 16 && cLo < 16 }
    assert(cornerHit <= 6,
      s"3-D skipping too weak: $cornerHit/16 files intersect the corner; boxes=${boxes.toSeq}")
    // per-axis ranges also prune (each axis only spans part of the files)
    Seq[((Long, Long, Long, Long, Long, Long)) => Boolean](
      { case (aLo, _, _, _, _, _) => aLo < 16 },
      { case (_, _, bLo, _, _, _) => bLo < 16 },
      { case (_, _, _, _, cLo, _) => cLo < 16 }
    ).zipWithIndex.foreach { case (p, ax) =>
      val hit = boxes.count(p)
      assert(hit < 16, s"axis $ax never prunes: all 16 files intersect")
    }
    // correctness: the re-layout loses nothing
    assert(spark.read.parquet(path).count() == 60000)
    val got = spark.read.parquet(path)
      .filter(col("a") < 16 && col("b") < 16 && col("c") < 16).count()
    val exp = df.filter(col("a") < 16 && col("b") < 16 && col("c") < 16).count()
    assert(got == exp)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }

  test("z-ordered layout skips files on BOTH dimensions") {
    val path = "/tmp/graft_test_zorder"
    val df = (1L to 40000L).map(i => (i % 200, (i * 31) % 200, i))
      .toDF("a", "b", "id")
    graft.pipeline.Medallion.writeZOrdered(df, path, "a", "b", 16)
    val files = spark.read.parquet(path).inputFiles
    assert(files.length == 16)
    val boxes = files.map { f =>
      spark.read.parquet(f)
        .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b")))
        .as[(Long, Long, Long, Long)].head()
    }
    // a 50x50 corner query: only files whose box intersects can match
    val hit = boxes.count { case (aLo, aHi, bLo, bHi) =>
      aLo < 50 && bLo < 50 }
    assert(hit <= 8, s"2-D skipping too weak: $hit/16 files intersect; boxes=${boxes.toSeq}")
    // nothing lost, and the scan result is unchanged by the re-layout
    assert(spark.read.parquet(path).count() == 40000)
    val got = spark.read.parquet(path)
      .filter(col("a") < 50 && col("b") < 50).count()
    val exp = df.filter(col("a") < 50 && col("b") < 50).count()
    assert(got == exp)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }
}

class JdbcSpec extends SparkSpec {
  import spark.implicits._

  test("JDBC round trip through embedded Derby preserves rows; partitioned scan parallelizes") {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val dbPath = "/tmp/graft_test_derby"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dbPath))
    val url = s"jdbc:derby:$dbPath;create=true"
    val props = new java.util.Properties()
    val df = (1L to 100L).map(i => (i, i * 1.5, s"p${i % 3}")).toDF("k", "v", "tag")
    df.write.mode("overwrite")
      .option("createTableColumnTypes", "tag VARCHAR(8)")
      .jdbc(url, "t_round_trip", props)
    val back = graft.sources.Readers.jdbc(spark, url, "t_round_trip", props)
    assert(back.as[(Long, Double, String)].collect().toSet ==
      df.as[(Long, Double, String)].collect().toSet)
    val part = graft.sources.Readers.jdbcPartitioned(spark, url, "t_round_trip",
      "k", 1L, 101L, 4, props)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    // filter pushdown reaches the JDBC source
    val filtered = part.filter(col("k") <= 10)
    assert(filtered.count() == 10)
  }
}
