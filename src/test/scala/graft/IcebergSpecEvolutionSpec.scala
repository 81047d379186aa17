package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop
import graft.sources.IcebergInterop.IceTransform
import graft.pipeline.GraftSql

/** Partition spec evolution (public Iceberg spec §Partition Evolution):
  * a metadata-only commit swaps the DEFAULT spec; files written before
  * it keep their old partition records, and reads prune each file
  * through the spec it was written under — a field a file's record
  * does not carry says nothing about the file, so it is kept and the
  * row predicate decides. */
class IcebergSpecEvolutionSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("ice_evolve_").toFile
    d.deleteOnExit(); d.getPath
  }

  /** identity(p) table with two appends, then evolve to bucket[4](id)
    * and append again — the three-spec-era fixture most tests share. */
  private def evolved(): String = {
    val base = tmp()
    val a = spark.range(0, 40).toDF("id")
      .withColumn("p", concat(lit("p"), (col("id") % 2).cast("string")))
    IcebergInterop.overwrite(a, base, partitionBy = Seq("p"))
    IcebergInterop.evolveSpec(spark, base,
      add = Seq("id" -> IceTransform.Bucket(4)), drop = Seq("p"))
    val b = spark.range(100, 140).toDF("id")
      .withColumn("p", concat(lit("p"), (col("id") % 2).cast("string")))
    IcebergInterop.append(b, base)
    base
  }

  test("evolution is metadata-only and results are value-exact across eras") {
    val base = evolved()
    val got = IcebergInterop.read(spark, base)
    assert(got.count() == 80)
    assert(got.agg(sum("id")).head().getLong(0) ==
      (0L until 40L).sum + (100L until 140L).sum)
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.specsById.keySet == Set(0, 1))
    assert(snap.defaultSpecId == 1)
    assert(snap.specFields.map(f => (f.name, f.transform)) ==
      Seq(("id_bucket", "bucket[4]")))
    // old files keep identity(p) records; new files carry the bucket
    val (oldFiles, newFiles) =
      snap.files.partition(_.partitionValues.contains("p"))
    assert(oldFiles.nonEmpty && newFiles.nonEmpty)
    assert(newFiles.forall(_.partitionValues.keySet == Set("id_bucket")))
  }

  test("readEq keeps pre-evolution files (absent field) and prunes post-evolution buckets") {
    val base = evolved()
    val snap = IcebergInterop.snapshot(spark, base)
    val oldCount = snap.files.count(_.partitionValues.contains("p"))
    val newCount = snap.files.count(_.partitionValues.contains("id_bucket"))
    assert(newCount >= 2, "fixture: want >1 bucket to prove pruning")
    // a key only in era B: every old file kept (conservative), but only
    // ONE bucket of the new era opens
    val hit = IcebergInterop.readEq(spark, base, Map("id" -> 107L))
    assert(hit.select("id").collect().map(_.getLong(0)).toSeq == Seq(107L))
    val opened = hit.inputFiles.length
    assert(opened < oldCount + newCount,
      s"pruning must drop some buckets (opened $opened of ${oldCount + newCount})")
    assert(opened >= oldCount + 1)
    // a key only in era A: old files prune by nothing (no id-derived
    // field in spec 0), so the row must still be found
    assert(IcebergInterop.readEq(spark, base, Map("id" -> 7L))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(7L))
    // the DROPPED field still prunes era-A files (era-B files, whose
    // records lack it, are kept and their rows pass the row filter)
    val byP = IcebergInterop.readEq(spark, base, Map("p" -> "p1"))
    assert(byP.count() == 40) // 20 odd-id rows per era
    assert(byP.inputFiles.length < oldCount + newCount,
      "p=... must prune the other identity partition's era-A files")
  }

  test("identity partitionFilters refuse once live files predate the field") {
    // partitionFilters prune with NO row residual, so a file written
    // before the field joined the spec cannot be judged — refuse and
    // point at readEq
    val base = tmp()
    IcebergInterop.overwrite(
      spark.range(10).toDF("id")
        .withColumn("p2", (col("id") % 2).cast("string")), base)
    IcebergInterop.evolveSpec(spark, base,
      add = Seq("p2" -> IceTransform.Identity))
    IcebergInterop.append(
      spark.range(10, 20).toDF("id")
        .withColumn("p2", (col("id") % 2).cast("string")), base)
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.read(spark, base,
        partitionFilters = Map("p2" -> "1"))
    }
    assert(e.getMessage.contains("spec evolved"))
    // readEq is the evolution-safe route: prunes era-B, keeps era-A
    assert(IcebergInterop.readEq(spark, base, Map("p2" -> "1")).count() == 10)
    // but a table whose files ALL carry the default spec still works
    val clean = tmp()
    IcebergInterop.overwrite(
      spark.range(10).toDF("id")
        .withColumn("p", (col("id") % 2).cast("string")),
      clean, partitionBy = Seq("p"))
    assert(IcebergInterop.read(spark, clean,
      partitionFilters = Map("p" -> "1")).count() == 5)
  }

  test("appends carry the spec history verbatim; manifests record their spec id") {
    val base = evolved()
    IcebergInterop.append(
      spark.range(200, 210).toDF("id")
        .withColumn("p", lit("px")), base)
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.specsById.keySet == Set(0, 1), "append must not re-mint specs")
    assert(snap.defaultSpecId == 1)
    assert(IcebergInterop.read(spark, base).count() == 90)
    // era-C files are stamped under the default (bucket) spec
    val eraC = snap.files.filter(_.path.contains("data/"))
      .filter(f => f.partitionValues.get("id_bucket").isDefined)
    assert(eraC.nonEmpty)
  }

  test("snapshot time travel reads pre-evolution state under its own spec") {
    val base = evolved()
    val first = IcebergInterop.snapshotIds(base).head
    val old = IcebergInterop.read(spark, base, snapshotId = Some(first))
    assert(old.count() == 40)
    assert(old.agg(sum("id")).head().getLong(0) == (0L until 40L).sum)
  }

  test("DML on an evolved table rewrites under the default spec, correctly") {
    // default spec after evolution is identity(p2) so copy-on-write
    // UPDATE is in scope; the touched OLD file was written under spec 0
    val base = tmp()
    val a = spark.range(0, 20).toDF("id").withColumn("v", lit(1L))
      .withColumn("p2", (col("id") % 2).cast("string"))
    IcebergInterop.overwrite(a, base) // unpartitioned spec 0
    IcebergInterop.evolveSpec(spark, base,
      add = Seq("p2" -> IceTransform.Identity))
    IcebergInterop.updateWhere(spark, base, col("id") === 3L,
      Map("v" -> lit(9L)))
    val got = IcebergInterop.read(spark, base)
    assert(got.count() == 20)
    assert(got.filter(col("id") === 3L).head().getAs[Long]("v") == 9L)
    assert(got.agg(sum("v")).head().getLong(0) == 19L + 9L)
    // the rewrite landed under the NEW spec
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.files.exists(_.partitionValues.keySet == Set("p2")))
  }

  test("maintenance that restamps partition records refuses on mixed eras") {
    // identity default spec (the transformed-spec refusal would fire
    // first otherwise) with era-A files still of the empty spec 0
    val base = tmp()
    IcebergInterop.overwrite(
      spark.range(10).toDF("id")
        .withColumn("p2", (col("id") % 2).cast("string")), base)
    IcebergInterop.evolveSpec(spark, base,
      add = Seq("p2" -> IceTransform.Identity))
    IcebergInterop.append(
      spark.range(10, 20).toDF("id")
        .withColumn("p2", (col("id") % 2).cast("string")), base)
    val e1 = intercept[IllegalArgumentException] {
      IcebergInterop.rewriteDataFiles(spark, base, minInputFiles = 2)
    }
    assert(e1.getMessage.contains("partition evolution"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergInterop.rewriteManifests(spark, base)
    }
    assert(e2.getMessage.contains("partition evolution"))
  }

  test("identical re-add reuses the spec field id; conflicting reuse refuses") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id"), base)
    IcebergInterop.evolveSpec(spark, base,
      add = Seq("id" -> IceTransform.Bucket(4)))
    val fid = IcebergInterop.snapshot(spark, base).specFields.head.fieldId
    IcebergInterop.evolveSpec(spark, base, add = Seq.empty,
      drop = Seq("id_bucket"))
    assert(IcebergInterop.snapshot(spark, base).specFields.isEmpty)
    IcebergInterop.evolveSpec(spark, base,
      add = Seq("id" -> IceTransform.Bucket(4)))
    assert(IcebergInterop.snapshot(spark, base).specFields.head.fieldId == fid,
      "identical (name, source, transform) re-add keeps its id forever")
    // same name, different definition → ambiguous across files → refuse
    IcebergInterop.evolveSpec(spark, base, add = Seq.empty,
      drop = Seq("id_bucket"))
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.evolveSpec(spark, base,
        add = Seq("id" -> IceTransform.Bucket(8)))
    }
    assert(e.getMessage.contains("one name cannot mean two things"))
  }

  test("dropColumn refuses while ANY spec era still sources the column") {
    val base = evolved()
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.dropColumn(spark, base, "p")
    }
    assert(e.getMessage.contains("partition spec field"))
  }

  test("evolveSpec validates sources, transforms and no-ops") {
    val base = tmp()
    IcebergInterop.overwrite(
      spark.range(5).toDF("id").withColumn("s", lit("x")), base)
    intercept[IllegalArgumentException] {
      IcebergInterop.evolveSpec(spark, base,
        add = Seq("nope" -> IceTransform.Identity))
    }
    intercept[IllegalArgumentException] { // day of a long column
      IcebergInterop.evolveSpec(spark, base,
        add = Seq("id" -> IceTransform.Day))
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.evolveSpec(spark, base, add = Seq.empty,
        drop = Seq("absent"))
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.evolveSpec(spark, base, add = Seq.empty, drop = Seq.empty)
    }
  }

  test("SQL: ALTER TABLE ADD/DROP PARTITION FIELD round trip") {
    val base = tmp()
    val a = spark.range(0, 30).toDF("id")
      .withColumn("cat", concat(lit("c"), (col("id") % 3).cast("string")))
    IcebergInterop.overwrite(a, base, partitionBy = Seq("cat"))
    GraftSql.registerIcebergTable(spark, "evo_sql_t", base)
    try {
      val r1 = GraftSql.sql(spark,
        "ALTER TABLE evo_sql_t ADD PARTITION FIELD bucket(4, id)").head()
      assert(r1.getAs[String]("default_spec") == "cat=identity, id=bucket[4]")
      val r2 = GraftSql.sql(spark,
        "ALTER TABLE evo_sql_t DROP PARTITION FIELD cat").head()
      assert(r2.getAs[String]("default_spec") == "id=bucket[4]")
      assert(r2.getAs[Long]("spec_id") == 2L)
      // wrong-transform drop refuses instead of dropping a lookalike
      val e = intercept[IllegalArgumentException] {
        GraftSql.sql(spark,
          "ALTER TABLE evo_sql_t DROP PARTITION FIELD bucket(8, id)")
      }
      assert(e.getMessage.contains("bucket[4]"))
      IcebergInterop.append(
        spark.range(500, 510).toDF("id").withColumn("cat", lit("c9")), base)
      // the direct append bypassed the SQL layer's view refresh —
      // re-register to see the new snapshot
      GraftSql.registerIcebergTable(spark, "evo_sql_t", base)
      assert(GraftSql.sql(spark,
        "SELECT count(*) AS n FROM evo_sql_t").head().getLong(0) == 40L)
      // non-Iceberg targets refuse with guidance
      val log = tmp()
      graft.pipeline.GraftLog.overwrite(spark.range(3).toDF("id"), log)
      GraftSql.registerTable(spark, "evo_sql_log", log)
      val e2 = intercept[IllegalArgumentException] {
        GraftSql.sql(spark,
          "ALTER TABLE evo_sql_log ADD PARTITION FIELD id")
      }
      assert(e2.getMessage.contains("Iceberg feature"))
    } finally {
      GraftSql.unregisterTable(spark, "evo_sql_t")
      GraftSql.unregisterTable(spark, "evo_sql_log")
    }
  }
}
