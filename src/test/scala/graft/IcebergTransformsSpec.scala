package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.functions.IcebergTransforms
import graft.sources.IcebergInterop
import graft.sources.IcebergInterop.IceTransform

/** Iceberg partition transforms: the murmur3_x86_32 known-answer vectors
  * the public spec lists (Appendix B), codegen/interpreted agreement for
  * the bucket expression, and writer→readEq round trips with
  * transform-aware file pruning for bucket / truncate / day. */
class IcebergTransformsSpec extends SparkSpec {
  import spark.implicits._

  test("murmur3 known-answer vectors from the Iceberg spec") {
    assert(IcebergTransforms.hashLong(34L) == 2017239379)
    assert(IcebergTransforms.bucketString("iceberg", Int.MaxValue) ==
      (1210000089 & Int.MaxValue) % Int.MaxValue)
    assert(IcebergTransforms.murmur3(
      "iceberg".getBytes(java.nio.charset.StandardCharsets.UTF_8)) == 1210000089)
    assert(IcebergTransforms.hashLong(17486L) == -653330422)            // date 2017-11-16
    assert(IcebergTransforms.hashLong(1510871468000000L) == -2047944441) // ts 2017-11-16T22:31:08
  }

  test("bucket expression agrees with the scala helper (long and string, codegen path)") {
    val df = (1L to 500L).map(i => (i, s"s$i")).toDF("l", "s")
    val got = df.select(col("l"), col("s"),
        IcebergTransforms.bucket(col("l"), 16).as("bl"),
        IcebergTransforms.bucket(col("s"), 16).as("bs"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(2) == IcebergTransforms.bucketLong(r.getLong(0), 16))
      assert(r.getInt(3) == IcebergTransforms.bucketString(r.getString(1), 16))
    }
  }

  test("truncate floors negatives toward -infinity (spec semantics)") {
    assert(IcebergTransforms.truncateLong(17L, 10) == 10L)
    assert(IcebergTransforms.truncateLong(-3L, 10) == -10L)
    assert(IcebergTransforms.truncateLong(-10L, 10) == -10L)
    assert(IcebergTransforms.truncateString("abcdef", 3) == "abc")
  }

  private def tmp() = {
    val d = Files.createTempDirectory("icet").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("bucket-partitioned table: readEq prunes to one bucket and rows are exact") {
    val base = tmp()
    val df = (1L to 2000L).map(i => (i, i % 97, s"v$i")).toDF("k", "g", "v")
    IcebergInterop.overwriteTransformed(df, base,
      Seq("k" -> IceTransform.Bucket(8)))
    val all = IcebergInterop.read(spark, base)
    assert(all.count() == 2000)
    val one = IcebergInterop.readEq(spark, base, Map("k" -> 42L))
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // transform-aware pruning: only the matching bucket's file is opened
    assert(one.inputFiles.length == 1,
      s"expected 1 pruned file, got ${one.inputFiles.length}")
    assert(all.inputFiles.length == 8)
  }

  test("truncate-partitioned table: pruning by floored range") {
    val base = tmp()
    val df = (0L until 1000L).map(i => (i, s"r$i")).toDF("k", "v")
    IcebergInterop.overwriteTransformed(df, base,
      Seq("k" -> IceTransform.Truncate(100)))
    val got = IcebergInterop.readEq(spark, base, Map("k" -> 250L))
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(250L))
    assert(got.inputFiles.length == 1) // the [200,300) file only
  }

  test("day-partitioned table: pruning by epoch day") {
    val base = tmp()
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2017-11-16 22:31:08")),
      (2L, java.sql.Timestamp.valueOf("2017-11-16 01:00:00")),
      (3L, java.sql.Timestamp.valueOf("2017-11-17 00:00:01"))).toDF("id", "ts")
    IcebergInterop.overwriteTransformed(df, base,
      Seq("ts" -> IceTransform.Day))
    val got = IcebergInterop.readEq(spark, base,
      Map("ts" -> java.sql.Timestamp.valueOf("2017-11-16 22:31:08")))
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // both 11-16 rows share the day partition; 11-17 pruned out
    assert(got.inputFiles.length == 1)
  }

  test("identity spec still round-trips through the generalized writer") {
    val base = tmp()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p")
    IcebergInterop.overwriteTransformed(df, base,
      Seq("p" -> IceTransform.Identity))
    val got = IcebergInterop.readEq(spark, base, Map("p" -> "a"))
    assert(got.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }
}
