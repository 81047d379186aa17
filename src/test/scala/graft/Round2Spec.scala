package graft

import org.apache.spark.sql.functions._

import graft.functions.{Vec, VecAgg}
import graft.ops.{Relational, Similarity, TextAnalysis}
import graft.streaming.EventStreams

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = (1 to 60).map(i => (if (i <= 45) 1 else i, i.toLong))
    .toSeq.toDF("k", "id") // key 1 holds 75% of rows
  private lazy val right = Seq((1, "hot"), (50, "cold"), (99, "nomatch"))
    .toDF("k", "tag")

  test("skewJoin with a triggered hot path equals the plain join") {
    val plain = left.join(right, Seq("k"))
      .select("k", "id", "tag").as[(Int, Long, String)].collect().toSet
    val got = Relational.skewJoin(left, right, Seq("k"), saltBuckets = 4,
      skewedUnique = col("id"), hotKeyThreshold = 10L)
      .select("k", "id", "tag").as[(Int, Long, String)].collect().toSet
    assert(got == plain)
    assert(plain.count(_._1 == 1) == 45) // the hot key really was hot
  }

  test("skewJoin with no hot keys equals the plain join (cold path only)") {
    val got = Relational.skewJoin(left, right, Seq("k"), saltBuckets = 4,
      skewedUnique = col("id"), hotKeyThreshold = 1000L)
      .select("k", "id", "tag").as[(Int, Long, String)].collect().toSet
    val plain = left.join(right, Seq("k"))
      .select("k", "id", "tag").as[(Int, Long, String)].collect().toSet
    assert(got == plain)
  }

  test("skewJoin with sampled hot-key detection still equals the plain join") {
    val plain = left.join(right, Seq("k"))
      .select("k", "id", "tag").as[(Int, Long, String)].collect().toSet
    val got = Relational.skewJoin(left, right, Seq("k"), saltBuckets = 4,
      skewedUnique = col("id"), hotKeyThreshold = 10L,
      detectSampleFraction = 0.5)
      .select("k", "id", "tag").as[(Int, Long, String)].collect().toSet
    assert(got == plain)
  }

  test("skewJoin left preserves unmatched hot and cold rows") {
    val plain = left.join(right, Seq("k"), "left")
      .select("k", "id", "tag").as[(Int, Long, Option[String])].collect().toSet
    val got = Relational.skewJoin(left, right, Seq("k"), saltBuckets = 4,
      skewedUnique = col("id"), hotKeyThreshold = 10L, how = "left")
      .select("k", "id", "tag").as[(Int, Long, Option[String])].collect().toSet
    assert(got == plain)
    assert(got.size == 60) // every left row exactly once
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated 64-dim clusters, small jitter per member.
  private lazy val clustered = {
    val a = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val b = a.map(-_)
    (0 until 40).map { i =>
      val base = if (i % 2 == 0) a else b
      val v = base.clone(); v(i % 64) += 0.05f * ((i % 5) + 1)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
      .select($"vec_id", Vec.toDouble($"embedding").as("v"))
  }

  test("trainIvfCentroids converges to cluster means (deterministic)") {
    val c1 = Similarity.trainIvfCentroids(clustered, nLists = 2, lloydIters = 3)
    val c2 = Similarity.trainIvfCentroids(clustered, nLists = 2, lloydIters = 3)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // reproducible
    // the two centroids sit in opposite half-spaces
    assert(math.signum(c1(0)(0)) != math.signum(c1(1)(0)))
  }

  test("ivfTopK recall@3 vs brute force is 1.0 on separated clusters") {
    val queries = clustered.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val exact = Similarity.bruteForceTopK(clustered, queries, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(clustered, queries, 3,
      nLists = 4, nProbe = 2, lloydIters = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((exact -- approx).isEmpty, s"missed: ${exact -- approx}")
  }
}

class VecAggSpec extends SparkSpec {
  import spark.implicits._

  test("vecMean is the element-wise mean per group") {
    val df = Seq(
      ("g1", Seq(1.0, 2.0)), ("g1", Seq(3.0, 6.0)),
      ("g2", Seq(10.0, 0.0))).toDF("g", "v")
    val got = df.groupBy($"g").agg(VecAgg.vecMean($"v").as("m"))
      .select($"g", $"m").as[(String, Seq[Double])].collect().toMap
    assert(got("g1") == Seq(2.0, 4.0))
    assert(got("g2") == Seq(10.0, 0.0))
  }

  test("vecMean matches per-dimension avg on real embeddings") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(Vec.toDouble(col("embedding")).as("v"))
    val pooled = df.agg(VecAgg.vecMean(col("v")).as("m"))
      .select(element_at(col("m"), 1), element_at(col("m"), 2))
      .as[(Double, Double)].head()
    val direct = df.agg(
      avg(element_at(col("v"), 1)), avg(element_at(col("v"), 2)))
      .as[(Double, Double)].head()
    assert(math.abs(pooled._1 - direct._1) < 1e-12)
    assert(math.abs(pooled._2 - direct._2) < 1e-12)
  }
}

class SubwordSpec extends SparkSpec {
  import spark.implicits._

  test("subwordTokens splits case runs, digits and punctuation") {
    val got = Seq("Hello world42! XMLParser")
      .toDF("text")
      .select(TextAnalysis.subwordTokens(col("text")))
      .as[Seq[String]].head()
    assert(got == Seq("Hello", "world", "42", "!", "X", "M", "L", "Parser"))
  }
}

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate graft native expressions") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "round(graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c, " +
        "graft_sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS n")
      .as[(Double, Double, Long)].head()
    assert(got == ((11.0, 1.0, 2L)))
    // registration is idempotent
    GraftExtensions.register(spark)
  }

  test("graft_simhash via SQL equals the column API") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_simhash(array('the', 'quick', 'fox'))").as[Long].head()
    val viaApi = Seq(Seq("the", "quick", "fox")).toDF("toks")
      .select(graft.functions.SketchExpressions.simhash64(col("toks")))
      .as[Long].head()
    assert(viaSql == viaApi)
  }
}

class UpsertSpec extends SparkSpec {
  import spark.implicits._
  import graft.pipeline.Medallion

  test("upsert replaces same-key rows and appends new keys") {
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "v", "x")
    val updates = Seq((2L, "b2", 20.0), (3L, "c", 3.0)).toDF("k", "v", "x")
    val got = Medallion.upsert(base, updates, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
  }

  test("upsert with reordered update columns aligns by name") {
    val base = Seq((1L, "a", 1.0)).toDF("k", "v", "x")
    val updates = Seq((10.0, "z", 2L)).toDF("x", "v", "k")
    val got = Medallion.upsert(base, updates, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 1.0), (2L, "z", 10.0)))
  }
}

class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bandJoin equals the naive range join, boundaries inclusive/exclusive") {
    val left = Seq((1L, 100L), (2L, 250L), (3L, 1000L)).toDF("lid", "l_us")
    val right = Seq((10L, 70L), (11L, 100L), (12L, 240L), (13L, 980L), (14L, 1001L))
      .toDF("rid", "r_us")
    val w = 30L
    val naive = left.crossJoin(right)
      .filter($"r_us" <= $"l_us" && $"r_us" > $"l_us" - w)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val binned = graft.ops.Relational.bandJoin(left, right, "l_us", "r_us", w)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    // sanity on the fixture itself: inclusive right edge, exclusive left
    assert(naive == Set((1L, 11L), (2L, 12L), (3L, 13L)))
  }

  test("stream-stream band join matches the batch range join") {
    val dir = "/root/testdata/sf0.001"
    val ev = EventStreams.readEventStream(spark, dir)
    val joined = EventStreams.streamStreamBandJoin(
      ev.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts")),
      ev.filter($"event_type" === "view")
        .select($"user_id".as("v_user"), $"ts".as("v_ts")),
      "c_user", "v_user", "c_ts", "v_ts", "30 MINUTE")
    val got = EventStreams.drainAvailableNow(joined, mode = "append").count()
    val batch = Tables.load(spark, dir, "events")
    val want = batch.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
      .join(batch.filter($"event_type" === "view")
        .select($"user_id".as("v_user"), $"ts".as("v_ts")),
        expr("c_user = v_user AND v_ts >= c_ts - INTERVAL 30 MINUTE AND v_ts <= c_ts"))
      .count()
    assert(got == want)
  }
}

class CompactSpec extends SparkSpec {
  import graft.pipeline.Medallion

  test("compact merges small files preserving rows") {
    val path = "/tmp/graft_fixtures/compact_test"
    val src = Tables.load(spark, "/root/testdata/sf0.001", "events")
    src.repartition(8).write.mode("overwrite").parquet(path)
    val before = spark.read.parquet(path)
    val nRows = before.count()
    assert(before.inputFiles.length == 8)
    val nFiles = Medallion.compact(spark, path, targetRowsPerFile = nRows / 2 + 1)
    assert(nFiles == 2)
    assert(spark.read.parquet(path).count() == nRows)
  }
}

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._
  import graft.pipeline.Medallion

  test("bucketed co-located join plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    Medallion.writeBucketed(
      Tables.load(spark, dir, "lineitem").select($"l_orderkey", $"l_quantity"),
      "t_bucket_li", Seq("l_orderkey"), 4)
    Medallion.writeBucketed(
      Tables.load(spark, dir, "orders")
        .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority"),
      "t_bucket_or", Seq("l_orderkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("t_bucket_li")
        .join(spark.table("t_bucket_or"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and the result is the plain join's result
      val n = joined.count()
      val want = Tables.load(spark, dir, "lineitem").join(
        Tables.load(spark, dir, "orders"),
        $"l_orderkey" === $"o_orderkey").count()
      assert(n == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming dedup count matches batch count-distinct") {
    val stream = EventStreams.readEventStream(spark, dir)
      .withColumn("dup_key", pmod(col("event_id"), lit(97)))
    val got = EventStreams.drainAvailableNow(
      EventStreams.dedupByKey(stream, Seq("event_type", "dup_key"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n")))
      .as[(String, Long)].collect().toMap
    val want = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(pmod(col("event_id"), lit(97))).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("foreachBatch parquet ingestion lands every replayed row exactly once") {
    val path = "/tmp/graft_fixtures/stream_ingest_test"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    EventStreams.streamIngestParquet(
      EventStreams.readEventStream(spark, dir), path)
    val got = spark.read.parquet(path).count()
    val want = Tables.load(spark, dir, "events").count()
    assert(got == want)
  }

  test("stream-static join enrichment matches the batch join") {
    val nation = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val stream = EventStreams.readEventStream(spark, dir)
      .withColumn("n_nationkey", pmod(col("user_id"), lit(25)).cast("int"))
    val got = EventStreams.drainAvailableNow(
      EventStreams.streamStaticJoin(stream, nation, Seq("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n")))
      .as[(String, Long)].collect().toMap
    val want = Tables.load(spark, dir, "events")
      .withColumn("n_nationkey", pmod(col("user_id"), lit(25)).cast("int"))
      .join(nation, Seq("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }
}
