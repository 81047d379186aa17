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

  test("truncate on strings counts code points, not UTF-16 units") {
    // U+1F600 is a supplementary character: 2 UTF-16 code units, 1 char
    val s = "😀ab😁cd" // 😀ab😁cd = 6 characters
    assert(IcebergTransforms.truncateString(s, 3) == "😀ab")
    assert(IcebergTransforms.truncateString(s, 4) == "😀ab😁")
    assert(IcebergTransforms.truncateString(s, 6) eq s) // whole string
    // agreement with Spark's substring (the write path)
    val viaSpark = Seq(Tuple1(s)).toDF("s")
      .select(substring(col("s"), 1, 4)).head().getString(0)
    assert(IcebergTransforms.truncateString(s, 4) == viaSpark)
  }

  test("year/month/hour known-answer vectors (spec Appendix B examples)") {
    val micros = 1510871468000000L // 2017-11-16T22:31:08 UTC
    assert(IcebergTransforms.dayOfMicros(micros) == 17486)
    assert(IcebergTransforms.yearOfMicros(micros) == 47)
    assert(IcebergTransforms.monthOfMicros(micros) == 574)
    assert(IcebergTransforms.hourOfMicros(micros) == 419686) // 17486*24+22
    // pre-epoch: 1969-12-31T23:00:00 is year -1, month -1, hour -1
    val preEpoch = -3600000000L
    assert(IcebergTransforms.yearOfMicros(preEpoch) == -1)
    assert(IcebergTransforms.monthOfMicros(preEpoch) == -1)
    assert(IcebergTransforms.hourOfMicros(preEpoch) == -1)
    assert(IcebergTransforms.dayOfMicros(preEpoch) == -1)
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

  test("month-partitioned table: pruning by months-from-epoch") {
    val base = tmp()
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2017-11-16 22:31:08")),
      (2L, java.sql.Timestamp.valueOf("2017-11-02 01:00:00")),
      (3L, java.sql.Timestamp.valueOf("2017-12-01 00:00:01")),
      (4L, java.sql.Timestamp.valueOf("2018-01-05 12:00:00"))).toDF("id", "ts")
    IcebergInterop.overwriteTransformed(df, base,
      Seq("ts" -> IceTransform.Month))
    val got = IcebergInterop.readEq(spark, base,
      Map("ts" -> java.sql.Timestamp.valueOf("2017-11-16 22:31:08")))
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // both november rows share partition 574; december/january pruned
    assert(got.inputFiles.length == 1)
    val all = IcebergInterop.read(spark, base)
    assert(all.count() == 4 && all.inputFiles.length == 3)
  }

  test("year-partitioned table over a DATE source: civil-year pruning") {
    val base = tmp()
    val df = Seq(
      (1L, java.sql.Date.valueOf("2017-11-16")),
      (2L, java.sql.Date.valueOf("2017-01-01")),
      (3L, java.sql.Date.valueOf("2018-06-30"))).toDF("id", "d")
    IcebergInterop.overwriteTransformed(df, base,
      Seq("d" -> IceTransform.Year))
    val got = IcebergInterop.readEq(spark, base,
      Map("d" -> java.sql.Date.valueOf("2017-11-16")))
    // readEq row-filters too: only the exact-match row survives, but
    // the single opened file proves partition-level (year) pruning
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.inputFiles.length == 1) // 2018 file pruned
  }

  test("hour-partitioned table: pruning by hours-from-epoch") {
    val base = tmp()
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2017-11-16 22:31:08")),
      (2L, java.sql.Timestamp.valueOf("2017-11-16 22:05:00")),
      (3L, java.sql.Timestamp.valueOf("2017-11-16 23:00:01"))).toDF("id", "ts")
    IcebergInterop.overwriteTransformed(df, base,
      Seq("ts" -> IceTransform.Hour))
    val got = IcebergInterop.readEq(spark, base,
      Map("ts" -> java.sql.Timestamp.valueOf("2017-11-16 22:31:08")))
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.inputFiles.length == 1) // the 23:00 file pruned
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
