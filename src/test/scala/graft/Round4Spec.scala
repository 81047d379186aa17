package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Round-3 hardening specs: the ADVICE.md fixes (outer-join bloom guard,
  * as-of null handling, SCD2 intra-batch collapse, idempotent gold merge)
  * plus the de-UDF'd bloom plan assertion. */
class BloomPlanSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrefilterJoin rejects join types that keep unmatched fact rows") {
    val fact = Seq((1L, 1L)).toDF("fk", "id")
    val dim = Seq((1L, "d")).toDF("dk", "tag")
    intercept[IllegalArgumentException] {
      Relational.bloomPrefilterJoin(fact, dim, "fk", "dk", 10L, how = "left")
    }
    intercept[IllegalArgumentException] {
      Relational.bloomPrefilterJoin(fact, dim, "fk", "dk", 10L, how = "full_outer")
    }
  }

  test("bloom probe is a codegen expression, not a ScalaUDF") {
    // file-backed fact side: over a LocalRelation the optimizer evaluates
    // the (deterministic) probe eagerly and no Filter node survives
    val factPath = "/tmp/graft_test_bloom_fact"
    (1L to 500L).map(i => (i % 50, i)).toDF("fk", "id")
      .write.mode("overwrite").parquet(factPath)
    val fact = spark.read.parquet(factPath)
    val dim = Seq(3L, 7L).map(k => (k, s"d$k")).toDF("dk", "tag")
    val df = Relational.bloomPrefilterJoin(fact, dim, "fk", "dk", 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"bloom probe must not be a UDF:\n$plan")
    assert(plan.contains("graft_bloom_might_contain"),
      s"expected the native bloom probe in the plan:\n$plan")
    // and it still filters: only the 2 dim keys' rows survive the probe side
    assert(df.count() == 2 * 10)
  }
}

class AsOfNullSpec extends SparkSpec {
  import spark.implicits._
  import graft.plans.AsOfJoin

  test("native as-of join survives null keys and timestamps on both sides") {
    val left = Seq(
      (Some(1L), Some(100L)), (Some(1L), None), (None, Some(50L)),
      (Some(2L), Some(10L))).toDF("k", "ts")
    val right = Seq(
      (Some(1L), Some(90L), Some(90L)), (Some(1L), None, Some(-1L)),
      (None, Some(5L), Some(-2L)), (Some(3L), Some(1L), Some(1L)))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asOfJoinNative(left, right, "k", "ts", Seq("v"))
      .select("k", "ts", "asof_v")
      .as[(Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    assert(got == Set(
      (Some(1L), Some(100L), Some(90L)), // normal backward match
      (Some(1L), None, None),            // null left ts -> unmatched
      (None, Some(50L), None),           // null left key -> unmatched
      (Some(2L), Some(10L), None)))      // no right rows for key
  }

  test("forward native as-of join survives nulls too") {
    val left = Seq((Some(1L), Some(10L)), (None, None)).toDF("k", "ts")
    val right = Seq((Some(1L), Some(20L), Some(20L)),
      (Some(1L), None, Some(-1L))).toDF("k", "ts", "v")
    val got = AsOfJoin.asOfJoinNative(left, right, "k", "ts", Seq("v"),
      forward = true)
      .select("k", "ts", "asof_v")
      .as[(Option[Long], Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (Some(1L), Some(10L), Some(20L)),
      (None, None, None)))
  }
}

class Scd2MultiUpdateSpec extends SparkSpec {
  import spark.implicits._
  import graft.pipeline.Medallion

  test("scd2Apply with several updates per key applies only the latest") {
    val dim = Seq((1L, "bronze", 10L, None: Option[Long], true))
      .toDF("k", "tier", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "silver", 20L), (1L, "gold", 30L), (1L, "platinum", 40L))
      .toDF("k", "tier", "eff_ts")
    val got = Medallion.scd2Apply(dim, updates, Seq("k"), Seq("tier"), "eff_ts")
      .select("k", "tier", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(_._3).toSeq
    // exactly one closed old version and ONE new current version (latest)
    assert(got == Seq(
      (1L, "bronze", 10L, Some(40L), false),
      (1L, "platinum", 40L, None, true)))
    assert(got.count(_._5) == 1, "exactly one is_current per key")
  }
}

class AnnRecallGateSpec extends SparkSpec {
  import graft.ops.Similarity

  test("ANN recall@3 >= 0.9 on the real embeddings table (failing recall fails the build)") {
    // mirrors q96_ann_recall at sf0.001; the recorded gate — a regression
    // in either index's recall breaks `sbt test`, not just a bench number
    val recalls = SparkEntry.queries("q96_ann_recall")(spark, "/root/testdata/sf0.001")
      .select("index", "recall").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(recalls.keySet == Set("lsh_multi", "ivf"))
    recalls.foreach { case (idx, r) =>
      assert(r >= 0.9, s"$idx recall@3 dropped to $r (gate: >= 0.9)")
    }
  }

  test("recallAtK is 1.0 for an ANN result equal to the exact result") {
    import spark.implicits._
    val exact = Seq((1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 12L))
      .toDF("query_id", "rank", "vec_id")
    val full = Similarity.recallAtK(exact, exact, 2).collect().head
    assert(full.getAs[Double]("recall") == 1.0)
    val half = Similarity.recallAtK(exact.filter($"vec_id" =!= 11L), exact, 2)
      .collect().head
    assert(half.getAs[Double]("recall") < 1.0)
  }
}

class SkewHotPathSpec extends SparkSpec {

  test("q97's skew detection marks event_type keys hot and plans the salted union") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // the detection predicate q97 uses, at this SF's threshold: every
    // type holds ~200 rows, so with threshold 100 ALL keys are hot
    val hot = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 100).collect()
    assert(hot.length == 5, s"expected all 5 event types hot, got ${hot.length}")
    val dim = ev.groupBy(col("event_type")).agg(count(lit(1)).as("type_n"))
    val joined = graft.ops.Relational.skewJoin(ev, dim, Seq("event_type"),
      saltBuckets = 4, skewedUnique = col("event_id"), hotKeyThreshold = 100L)
    // plan shape: the hot/cold split must materialize as a Union
    assert(joined.queryExecution.optimizedPlan.toString.contains("Union"),
      "skew join should plan the salted-union shape")
    // path-independence: same result as the plain join
    val plain = ev.join(dim, "event_type")
    assert(joined.count() == plain.count())
  }
}

class HttpSourceSpec extends SparkSpec {
  import org.apache.spark.sql.types._

  private def serve(json: String): (com.sun.net.httpserver.HttpServer, String) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", new com.sun.net.httpserver.HttpHandler {
      def handle(x: com.sun.net.httpserver.HttpExchange): Unit = {
        val b = json.getBytes("UTF-8")
        x.sendResponseHeaders(200, b.length)
        x.getResponseBody.write(b); x.close()
      }
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/data")
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("httpJson fetches a pretty-printed JSON array into a typed DataFrame") {
    val (server, url) = serve(
      """[
        |  {"id": 1, "name": "alice"},
        |  {"id": 2, "name": "bob"}
        |]""".stripMargin)
    try {
      val df = graft.sources.Readers.httpJson(spark, url, schema)
      server.stop(0) // eager fetch: DataFrame must survive the server
      import spark.implicits._
      assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "alice"), (2L, "bob")))
    } finally server.stop(0)
  }

  test("httpJsonPartitioned fetches N urls executor-side") {
    val (s1, u1) = serve("""[{"id": 1, "name": "a"}]""")
    val (s2, u2) = serve("""[{"id": 2, "name": "b"}]""")
    try {
      val df = graft.sources.Readers.httpJsonPartitioned(
        spark, Seq(u1, u2), schema)
      import spark.implicits._
      assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a"), (2L, "b")))
    } finally { s1.stop(0); s2.stop(0) }
  }

  test("httpJson surfaces non-200 responses as errors") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/missing", new com.sun.net.httpserver.HttpHandler {
      def handle(x: com.sun.net.httpserver.HttpExchange): Unit = {
        x.sendResponseHeaders(404, -1); x.close()
      }
    })
    server.start()
    try intercept[IllegalArgumentException] {
      graft.sources.Readers.httpJson(spark,
        s"http://127.0.0.1:${server.getAddress.getPort}/missing", schema)
    } finally server.stop(0)
  }
}

class RedactionSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.TextAnalysis

  test("redact masks email and phone spans and leaves other text intact") {
    val df = Seq(
      "reach me at jo.na_1@mail.example.org or 555-123456 thanks",
      "no pii here at all",
      "double a@b.c d@e.f and 800-1 900-22").toDF("t")
    val got = df.select(TextAnalysis.redact($"t").as("clean"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "reach me at <EMAIL> or <PHONE> thanks",
      "no pii here at all",
      "double <EMAIL> <EMAIL> and <PHONE> <PHONE>"))
  }

  test("repetitionStats: fully-repeated text has dup_ratio near 1, distinct text 0") {
    val docs = Seq(
      ("rep", "x x x x x x"),        // 5 bigrams, 1 distinct
      ("uni", "a b c d e f")).toDF("g", "text") // 5 bigrams, 5 distinct
    val got = TextAnalysis.repetitionStats(docs, col("g"), col("text"), 2)
      .select("g", "total_grams", "distinct_grams", "dup_ratio")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toMap2
    assert(got("rep") == (5L, 1L, 0.8))
    assert(got("uni") == (5L, 5L, 0.0))
  }

  private implicit class Tupled(a: Array[(String, Long, Long, Double)]) {
    def toMap2: Map[String, (Long, Long, Double)] =
      a.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }
}

class ContaminationSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.TextAnalysis

  test("contamination counts distinct test n-grams that appear in any train doc") {
    val docs = Seq(
      (1L, "a b c d e f", false),  // train: grams "a b","b c","c d","d e","e f"
      (2L, "x y z w v u", false),  // train, disjoint
      (10L, "a b c q r s", true),  // test: "a b","b c" hit; "c q","q r","r s" miss
      (20L, "p p p p p p", true))  // test: "p p" (distinct) — no hit
      .toDF("doc_id", "text", "is_test")
    val got = TextAnalysis.contamination(docs, col("doc_id"), col("text"),
      col("is_test"), n = 2)
      .select("doc_id", "n_grams", "n_hit")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 5L, 2L), (20L, 1L, 0L)))
  }

  test("decontaminate drops exactly the leaking train docs; short docs survive") {
    val train = Seq(
      (1L, "a b c d e f"),  // shares "a b" with test doc 10 → drops
      (2L, "x y z w v u"),  // disjoint → survives
      (3L, "tiny"))         // < n tokens: no grams → survives
      .toDF("doc_id", "text")
    val test = Seq((10L, "a b c q r s")).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(train, test,
      col("doc_id"), col("text"), n = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L))
    // columns pass through intact
    assert(TextAnalysis.decontaminate(train, test,
      col("doc_id"), col("text"), n = 2).columns.toSeq ==
      Seq("doc_id", "text"))
  }
}

class SketchesSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Sketches

  test("heavyHitters equals plain GROUP BY HAVING exactly, with no ScalaUDF in the plan") {
    val df = ((1L to 900L).map(_ => 7L) ++ (1L to 500L).map(_ => 13L) ++
      (1L to 2000L).map(i => i % 400 + 100L)).toDF("k")
    val got = Sketches.heavyHitters(df, col("k"), minCount = 500L)
      .as[(Long, Long)].collect().toSet
    val exact = df.groupBy("k").count().filter(col("count") >= 500)
      .as[(Long, Long)].collect().toSet
    assert(got == exact)
    assert(got.map(_._1) == Set(7L, 13L))
    val plan = Sketches.heavyHitters(df, col("k"), 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"CMS probe must be codegen'd:\n$plan")
  }

  test("heavyHitters keeps the null-key group, like GROUP BY ... HAVING does") {
    // 600 nulls (heavy), 700 of key 5 (heavy), 2000 cold keys
    val df = ((1L to 600L).map(_ => Option.empty[Long]) ++
      (1L to 700L).map(_ => Some(5L)) ++
      (1L to 2000L).map(i => Some(i % 500 + 100L))).toDF("k")
    val got = Sketches.heavyHitters(df, col("k"), minCount = 500L)
      .as[(Option[Long], Long)].collect().toSet
    val exact = df.groupBy("k").count().filter(col("count") >= 500)
      .as[(Option[Long], Long)].collect().toSet
    assert(got == exact)
    assert(got == Set((None, 600L), (Some(5L), 700L)))
  }
}

class QuantileGateSpec extends SparkSpec {
  import spark.implicits._

  test("percentile_approx rank error stays within the 1/accuracy guarantee (gate)") {
    val rows = SparkEntry.queries("q103_quantile_gate")(spark, "/root/testdata/sf0.001")
      .select("q", "rank_error", "n_rows").as[(Double, Double, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq(0.5, 0.9, 0.99))
    rows.foreach { case (q, err, n) =>
      // accuracy=10000 → guaranteed rank error <= 1e-4, PLUS the exact
      // rank's own discretization floor of one row (1/n — at 6k rows
      // that floor is 1.67e-4, larger than the sketch bound itself),
      // plus the query's 1e-6 rounding
      val bound = 1.0e-4 + 1.0 / n + 1.0e-6
      assert(err <= bound,
        s"quantile sketch degraded at q=$q: rank error $err > $bound")
    }
  }
}

class GoldIdempotenceSpec extends SparkSpec {
  import spark.implicits._

  test("replay of an already-merged batch is skipped; fresh queries still merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gold = "/tmp/graft_test_gold_idem"
    val ckpt = "/tmp/graft_test_gold_idem_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(gold))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))

    val mem = MemoryStream[(String, Double)]
    mem.addData(("a", 1.0), ("b", 2.0))
    graft.streaming.EventStreams.streamIncrementalGold(
      mem.toDF().toDF("k", "v"), "k", "v", gold, Some(ckpt))
    def read() = spark.read.parquet(gold)
      .select(col("k"), col("n_events"), col("sum_value_dec").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(read() == Seq(("a", 1L, 1.0), ("b", 1L, 2.0)))

    // simulate the crash window: offsets lost (checkpoint wiped) but the
    // gold swap committed -> the SAME batchId 0 is re-delivered under the
    // same checkpoint path and must be skipped, not double-counted
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val replay = MemoryStream[(String, Double)]
    replay.addData(("a", 1.0), ("b", 2.0))
    graft.streaming.EventStreams.streamIncrementalGold(
      replay.toDF().toDF("k", "v"), "k", "v", gold, Some(ckpt))
    assert(read() == Seq(("a", 1L, 1.0), ("b", 1L, 2.0)),
      "replayed batch 0 must be idempotent")

    // a genuinely NEW query (different checkpoint) against the same gold
    // table merges normally even though its batchId is also 0
    val mem2 = MemoryStream[(String, Double)]
    mem2.addData(("a", 10.0))
    graft.streaming.EventStreams.streamIncrementalGold(
      mem2.toDF().toDF("k", "v"), "k", "v", gold,
      Some("/tmp/graft_test_gold_idem_ckpt2"))
    assert(read() == Seq(("a", 2L, 11.0), ("b", 1L, 2.0)))

    Seq(gold, ckpt, "/tmp/graft_test_gold_idem_ckpt2").foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
  }
}
