package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.DeltaInterop

/** changesSince append-only semantics beyond the q171 oracle: refusals
  * on deletes/overwrites in range, the empty head read, and
  * exactly-once delivery across an OPTIMIZE. */
class DeltaIncrementalSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("delta_inc_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("appends deliver once, tagged; optimize delivers nothing") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base) // v0
    DeltaInterop.append(spark.range(10, 15).toDF("id").coalesce(1), base) // v1
    DeltaInterop.optimize(spark, base) // v2
    DeltaInterop.append(spark.range(15, 18).toDF("id").coalesce(1), base) // v3
    val got = DeltaInterop.changesSince(spark, base, 0L)
      .select("id", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq ==
      ((10L to 14L).map((_, 1L)) ++ (15L to 17L).map((_, 3L))))
  }

  test("reading from head yields an empty, correctly-shaped frame") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(4).toDF("id").coalesce(1), base)
    val got = DeltaInterop.changesSince(spark, base, 0L)
    assert(got.columns.toSeq == Seq("id", "_commit_version"))
    assert(got.count() == 0)
  }

  test("a delete or overwrite inside the range is refused") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(8).toDF("id").coalesce(1), base)
    val file = DeltaInterop.snapshot(spark, base).files.head.path
    DeltaInterop.deleteRowPositions(spark, base, file, Seq(0L))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.changesSince(spark, base, 0L).collect()
    }
    assert(e.getMessage.contains("removed data") ||
      e.getMessage.contains("deletion vector"))

    val base2 = tmp()
    DeltaInterop.overwrite(spark.range(8).toDF("id").coalesce(1), base2)
    DeltaInterop.overwrite(spark.range(3).toDF("id").coalesce(1), base2)
    intercept[IllegalArgumentException] {
      DeltaInterop.changesSince(spark, base2, 0L).collect()
    }
  }

  test("partition values re-attach on incremental reads") {
    val base = tmp()
    val df = spark.range(8).select(col("id"), (col("id") % 2).cast("int").as("b"))
    DeltaInterop.overwrite(df.coalesce(1), base, partitionBy = Seq("b"))
    DeltaInterop.append(
      spark.range(8, 12).select(col("id"), (col("id") % 2).cast("int").as("b"))
        .coalesce(1), base, partitionBy = Seq("b"))
    val got = DeltaInterop.changesSince(spark, base, 0L)
    assert(got.count() == 4)
    assert(got.where(col("b") === 1).count() == 2)
  }
}
