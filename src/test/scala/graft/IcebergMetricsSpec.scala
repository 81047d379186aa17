package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop

/** Snapshot summary metrics (spec §Metrics): added-* counts from the
  * staging itself, total-* derived INCREMENTALLY from the parent
  * summary — O(1) per commit, never a manifest walk. A parent without
  * totals breaks the chain and the totals are omitted: absent beats
  * wrong. */
class IcebergMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_metrics_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def summaries(base: String): Seq[Map[String, String]] = {
    val metaDir = new File(s"$base/metadata")
    val src = scala.io.Source.fromFile(new File(metaDir, "version-hint.text"))
    val v = try src.mkString.trim finally src.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new File(metaDir, s"v$v.metadata.json"))
    val ss = node.get("snapshots")
    (0 until ss.size()).map(ss.get).map { s =>
      import scala.jdk.CollectionConverters._
      Option(s.get("summary")).map(sm =>
        sm.properties().asScala.map(e =>
          e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
    }.toSeq
  }

  test("create + appends accumulate exact running totals") {
    val base = freshBase("totals")
    IcebergInterop.overwrite((0L until 100L).toDF("id").repartition(2), base)
    IcebergInterop.append((100L until 130L).toDF("id").coalesce(1), base)
    IcebergInterop.append((130L until 150L).toDF("id").coalesce(1), base)
    val sums = summaries(base)
    assert(sums.head("added-data-files") == "2")
    assert(sums.head("added-records") == "100")
    assert(sums.head("total-records") == "100")
    assert(sums(1)("added-records") == "30")
    assert(sums(1)("total-records") == "130")
    assert(sums(2)("total-records") == "150")
    assert(sums(2)("total-data-files") == "4")
    assert(sums(2)("total-files-size").toLong ==
      sums(2)("added-files-size").toLong +
        sums(1)("added-files-size").toLong +
        sums.head("added-files-size").toLong)
    // the running total equals the actual read
    assert(IcebergInterop.read(spark, base).count() ==
      sums(2)("total-records").toLong)
  }

  test("a totals-less parent breaks the chain; overwrite restarts it") {
    val base = freshBase("chain")
    IcebergInterop.overwrite((0L until 50L).toDF("id").coalesce(1), base)
    // a delete snapshot records no totals
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 10L)
    IcebergInterop.append((50L until 60L).toDF("id").coalesce(1), base)
    val sums = summaries(base)
    val appendSum = sums.last
    assert(appendSum("added-records") == "10")
    assert(!appendSum.contains("total-records"),
      "an append after a totals-less delete must omit totals, not guess")
    // overwrite restarts the chain exactly
    IcebergInterop.overwrite((0L until 25L).toDF("id").coalesce(1), base)
    val after = summaries(base).last
    assert(after("operation") == "overwrite" &&
      after("total-records") == "25")
  }
}
