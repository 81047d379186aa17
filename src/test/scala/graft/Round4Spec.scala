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
