package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{DeltaInterop, IcebergInterop}

/** ADD COLUMN evolution semantics for both open formats (q165/q166
  * oracle-check the read values; here: refusals, time travel across the
  * evolution boundary, and multiple added columns). */
class SchemaEvolutionSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("evolve_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("delta: old files read NULL, new files read values") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base)
    DeltaInterop.addColumns(spark, base,
      StructType(Seq(StructField("tag", StringType))))
    DeltaInterop.append(spark.range(5, 8).select(col("id"),
      concat(lit("t"), col("id")).as("tag")).coalesce(1), base)
    val got = DeltaInterop.read(spark, base).orderBy("id").collect()
    assert(got.length == 8)
    assert(got.take(5).forall(_.isNullAt(1)))
    assert(got.drop(5).map(_.getString(1)).toSeq == Seq("t5", "t6", "t7"))
  }

  test("delta: time travel BEFORE the evolution sees the narrow schema") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(3).toDF("id").coalesce(1), base)
    DeltaInterop.addColumns(spark, base,
      StructType(Seq(StructField("v", LongType))))
    assert(DeltaInterop.read(spark, base).schema.fieldNames.toSeq ==
      Seq("id", "v"))
    assert(DeltaInterop.read(spark, base, versionAsOf = Some(0L))
      .schema.fieldNames.toSeq == Seq("id"))
  }

  test("delta: duplicate column refused; mapped tables evolve with fresh ids") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(3).toDF("id").coalesce(1), base)
    intercept[IllegalArgumentException] {
      DeltaInterop.addColumns(spark, base,
        StructType(Seq(StructField("id", LongType))))
    }
    // on a column-mapped table the new field gets a fresh mapping id +
    // physical name (never the logical name — that would collide with
    // a future rename's physical namespace)
    val mapped = tmp()
    DeltaInterop.overwriteColumnMapped(
      spark.range(3).toDF("id").coalesce(1), mapped, Map("id" -> "col-x"))
    DeltaInterop.addColumns(spark, mapped,
      StructType(Seq(StructField("v", LongType))))
    val snap = DeltaInterop.snapshot(spark, mapped)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(snap.physicalName("v") != "v")
    assert(snap.fieldId("v").exists(_ > snap.fieldId("id").get))
    val got = DeltaInterop.read(spark, mapped)
    assert(got.where(col("v").isNotNull).count() == 0)
  }

  test("iceberg: old files read NULL, new files read values; fresh field id") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(4).toDF("id").coalesce(1), base)
    IcebergInterop.addColumn(base, "tag", StringType)
    IcebergInterop.append(spark.range(4, 6).select(col("id"),
      concat(lit("t"), col("id")).as("tag")).coalesce(1), base)
    val got = IcebergInterop.read(spark, base).orderBy("id").collect()
    assert(got.length == 6)
    assert(got.take(4).forall(_.isNullAt(1)))
    assert(got.drop(4).map(_.getString(1)).toSeq == Seq("t4", "t5"))
    intercept[IllegalArgumentException] {
      IcebergInterop.addColumn(base, "tag", StringType)
    }
  }

  test("iceberg: two successive added columns stay distinguishable") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(2).toDF("id").coalesce(1), base)
    IcebergInterop.addColumn(base, "a", LongType)
    IcebergInterop.append(spark.range(2, 4).select(col("id"),
      (col("id") * 10).as("a")).coalesce(1), base)
    IcebergInterop.addColumn(base, "b", LongType)
    IcebergInterop.append(spark.range(4, 5).select(col("id"),
      (col("id") * 10).as("a"), (col("id") * 100).as("b")).coalesce(1), base)
    val got = IcebergInterop.read(spark, base).orderBy("id").collect()
    assert(got.map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq ==
      Seq((0L, -1L, -1L), (1L, -1L, -1L),
          (2L, 20L, -1L), (3L, 30L, -1L), (4L, 40L, 400L)))
  }
}
