package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Export

/** Shuffled-shard export: deterministic epoch order, exact coverage,
  * non-overlapping shard ranges, and a footer-only index. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("export_spec_").toFile
    d.deleteOnExit(); d.getPath
  }

  private val corpus =
    (0L until 500L).map(k => (k, s"doc-$k", (k % 7).toString))
      .toDF("id", "text", "grp")

  test("coverage is exact and the epoch order is seed-deterministic") {
    val p1 = tmp(); val p2 = tmp()
    val idx = Export.shuffledShards(corpus, p1, col("id"), "epoch0", 4)
    assert(idx.agg(sum("n_rows")).head().getLong(0) == 500L)
    assert(idx.count() == 4)
    // content equality (set semantics)
    val back = Export.readShards(spark, p1)
    assert(back.count() == 500)
    assert(back.except(corpus).isEmpty && corpus.except(back).isEmpty)
    // same seed, fresh export → byte-identical per-shard row sets
    Export.shuffledShards(corpus, p2, col("id"), "epoch0", 4)
    def shardSets(p: String): Seq[Set[Long]] =
      Export.shardIndex(spark, p).collect().map { r =>
        spark.read.parquet(s"$p/${r.getString(1)}")
          .select("id").as[Long].collect().toSet
      }.toSeq
    assert(shardSets(p1) == shardSets(p2),
      "same seed must reproduce the same shard layout")
  }

  test("a new seed is a different permutation; shard ranges are disjoint") {
    val p1 = tmp(); val p2 = tmp()
    Export.shuffledShards(corpus, p1, col("id"), "epoch0", 4)
    Export.shuffledShards(corpus, p2, col("id"), "epoch1", 4)
    def order(p: String): Seq[Long] = {
      val idx = Export.shardIndex(spark, p).collect()
      idx.flatMap(r => spark.read.parquet(s"$p/${r.getString(1)}")
        .select("id").as[Long].collect()).toSeq
    }
    assert(order(p1) != order(p2), "new seed must permute differently")
    // within + across shards the md5 order is monotone → per-shard
    // hash ranges must be disjoint and ascending with shard id
    val idx = Export.shardIndex(spark, p1).collect()
    val ranges = idx.map { r =>
      val h = spark.read.parquet(s"$p1/${r.getString(1)}")
        .select(md5(concat_ws("|", lit("epoch0"), col("id").cast("string")))
          .as("h")).as[String].collect()
      assert(h.sameElements(h.sorted), "rows inside a shard must be ordered")
      (h.min, h.max)
    }
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo,
        "shard hash ranges must be disjoint ascending")
      case _ => ()
    }
  }
}
