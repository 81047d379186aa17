package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.DeltaInterop

/** `delta.autoOptimize.optimizeWrite`: without it a partitioned
  * staging fans every input task out to every partition value it
  * holds (1000 tasks × 100 partitions = 100k small files per write at
  * cluster scale); with it the staging REBALANCEs on the partition
  * columns — one file per small value, and a skewed value still
  * splits at the AQE advisory size instead of pinning to one
  * straggler task. Default off, matching delta-spark. */
class DeltaOptimizedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_optw_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def filesPerValue(base: String): Map[String, Int] =
    DeltaInterop.snapshot(spark, base).files
      .groupBy(_.partitionValues.getOrElse("p", "?"))
      .map { case (k, fs) => k -> fs.size }

  test("off (default): every input task writes a file per value it holds") {
    val base = freshBase("off")
    val df = (0L until 300L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
    DeltaInterop.overwrite(df.repartition(4), base, partitionBy = Seq("p"))
    assert(filesPerValue(base).values.sum == 12)
  }

  test("on: rebalance co-locates each value; appends honor the table property") {
    val base = freshBase("on")
    val df = (0L until 300L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
    DeltaInterop.overwrite(df.repartition(4), base, partitionBy = Seq("p"),
      configuration = Map("delta.autoOptimize.optimizeWrite" -> "true"))
    assert(filesPerValue(base) == Map("0" -> 1, "1" -> 1, "2" -> 1))
    DeltaInterop.append(df.repartition(4), base)
    assert(filesPerValue(base) == Map("0" -> 2, "1" -> 2, "2" -> 2))
    assert(DeltaInterop.read(spark, base).count() == 600L)
  }

  test("on: a skewed partition value splits at the advisory size") {
    val base = freshBase("skew")
    val skewed = ((0L until 50000L).map(k => (k, 0)) ++
      (0L until 10L).map(k => (k + 100000L, 1)))
      .toDF("id", "p").repartition(8)
    val prevAdvisory = spark.conf.get(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    try DeltaInterop.overwrite(skewed, base, partitionBy = Seq("p"),
      configuration = Map("delta.autoOptimize.optimizeWrite" -> "true"))
    finally spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", prevAdvisory)
    val per = filesPerValue(base)
    assert(per("0") > 1, s"skewed value stayed one file: $per")
    assert(per("1") == 1, per.toString)
    assert(DeltaInterop.read(spark, base).count() == 50010L)
  }
}
