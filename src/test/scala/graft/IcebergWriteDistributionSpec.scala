package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop

/** `write.distribution-mode` (spec §Table Properties — the Iceberg
  * writer contract) on the staged partitioned write. The scale story:
  * `hash` must NOT pin each partition tuple to one task (a 1 TB
  * partition would write serially) — it REBALANCEs, so a skewed tuple
  * splits across tasks at the AQE advisory size while small tuples
  * still produce one file each; `none` skips the shuffle entirely;
  * `range` clusters by range. In every mode the directory split keeps
  * each staged file's partition tuple constant. */
class IcebergWriteDistributionSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_wdist_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def filesPerTuple(base: String): Map[String, Int] =
    IcebergInterop.snapshot(spark, base).files
      .groupBy(_.partitionValues.getOrElse("p", "?"))
      .map { case (k, fs) => k -> fs.size }

  test("hash (default): small tuples coalesce to one file each") {
    val base = freshBase("hash_small")
    val df = (0L until 300L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
    IcebergInterop.overwrite(df.repartition(8), base, partitionBy = Seq("p"))
    assert(filesPerTuple(base) == Map("0" -> 1, "1" -> 1, "2" -> 1))
  }

  test("hash: a skewed tuple splits at the advisory size (no straggler)") {
    val base = freshBase("hash_skew")
    val skewed = ((0L until 50000L).map(k => (k, 0)) ++
      (0L until 10L).map(k => (k + 100000L, 1)))
      .toDF("id", "p").repartition(8)
    val prevAdvisory = spark.conf.get(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    try IcebergInterop.overwrite(skewed, base, partitionBy = Seq("p"))
    finally spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", prevAdvisory)
    val per = filesPerTuple(base)
    // the heavy tuple must NOT be one serial task's single file; a
    // small tuple co-resident in the split shuffle partition may fan
    // out with the map-side slices (AQE splits by map chunks) — that
    // is noise at scale, the straggler is the thing being pinned away
    assert(per("0") > 1, s"skewed tuple stayed one file: $per")
    assert(IcebergInterop.read(spark, base).count() == 50010L)
  }

  test("none: zero shuffle — each input task fans out to its tuples") {
    val base = freshBase("none")
    val df = (0L until 300L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
    IcebergInterop.overwrite(df.coalesce(1), base, partitionBy = Seq("p"))
    IcebergInterop.setTableProperties(base,
      Map("write.distribution-mode" -> "none"))
    // 4 input tasks × 3 tuples each → 12 appended files (no shuffle
    // co-locates a tuple's rows); the same append under hash adds 3
    IcebergInterop.append(df.repartition(4), base,
      partitionBy = Seq("p"))
    val per = filesPerTuple(base)
    assert(per.values.sum == 3 + 12, per.toString)
    assert(IcebergInterop.read(spark, base).count() == 600L)
  }

  test("range: range-clustered staging, values exact") {
    val base = freshBase("range")
    val df = (0L until 300L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
    IcebergInterop.overwrite(df.coalesce(1), base, partitionBy = Seq("p"))
    IcebergInterop.setTableProperties(base,
      Map("write.distribution-mode" -> "range"))
    IcebergInterop.overwrite(df.repartition(4), base, partitionBy = Seq("p"))
    val per = filesPerTuple(base)
    assert(per.keySet == Set("0", "1", "2"))
    assert(per.values.forall(_ >= 1), per.toString)
    val got = IcebergInterop.read(spark, base)
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 100L, 1 -> 100L, 2 -> 100L))
  }

  test("unknown mode refuses loudly") {
    val base = freshBase("bad")
    val df = (0L until 30L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
    IcebergInterop.overwrite(df.coalesce(1), base, partitionBy = Seq("p"))
    IcebergInterop.setTableProperties(base,
      Map("write.distribution-mode" -> "zigzag"))
    val e = intercept[IllegalArgumentException](
      IcebergInterop.append(df, base, partitionBy = Seq("p")))
    assert(e.getMessage.contains("zigzag"))
  }
}
