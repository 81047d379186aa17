package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{DeltaDml, DeltaInterop}

/** Distributed row-level DML + Change Data Feed over the Delta interop:
  * predicate-driven DV deletes (executor-side bin writes), copy-on-write
  * updates scoped to touched files, cdc-action reads, and the DV-aware
  * add/remove fallback. */
class DeltaDmlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("ddml_").toFile
    d.deleteOnExit(); d.getPath
  }

  private val cdfConf = Map("delta.enableChangeDataFeed" -> "true")

  test("deleteVectoredWhere removes exactly the matching live rows") {
    val base = tmp()
    DeltaInterop.overwrite(
      (0L until 500L).map(i => (i, i % 7)).toDF("id", "g").repartition(4), base)
    val nFilesBefore = DeltaInterop.snapshot(spark, base).files.size
    DeltaDml.deleteVectoredWhere(spark, base, col("id") % 5 === 0)
    val got = DeltaInterop.read(spark, base).select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 500L).filter(_ % 5 != 0))
    // merge-on-read: same data files, now DV-carrying; none rewritten
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.files.size == nFilesBefore)
    assert(snap.files.forall(_.dv.isDefined)) // every file had multiples of 5
    assert(snap.files.map(_.dv.get.cardinality).sum == 100L)
  }

  test("overlapping deleteVectoredWhere merges DVs (no double-record, exact union)") {
    val base = tmp()
    DeltaInterop.overwrite(
      (0L until 300L).map(i => Tuple1(i)).toDF("id").coalesce(1), base)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") < 100)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") < 150) // overlaps
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.files.head.dv.get.cardinality == 150L,
      "new DV must be old ∪ new, not a double-count")
    assert(DeltaInterop.read(spark, base).count() == 150)
  }

  test("deleteVectoredWhere: predicate-NULL rows survive (SQL DELETE semantics)") {
    val base = tmp()
    DeltaInterop.overwrite(Seq[(Long, java.lang.Long)]((1L, 10L), (2L, null),
      (3L, 30L)).toDF("k", "v").coalesce(1), base)
    DeltaDml.deleteVectoredWhere(spark, base, col("v") > 15)
    assert(DeltaInterop.read(spark, base).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("deleteVectoredWhere with no match commits nothing") {
    val base = tmp()
    val v = DeltaInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base)
    assert(DeltaDml.deleteVectoredWhere(spark, base, col("id") > 999) == v)
  }

  test("updateWhere rewrites only touched files; untouched files survive by name") {
    val base = tmp()
    // two files with disjoint ranges: update hits only the first
    DeltaInterop.overwrite(
      (0L until 100L).map(i => (i, i * 1.0)).toDF("id", "v")
        .repartitionByRange(2, col("id")), base)
    val before = DeltaInterop.snapshot(spark, base)
    assert(before.files.size == 2)
    DeltaDml.updateWhere(spark, base, col("id") < 10,
      Map("v" -> (col("v") + 1000.0)))
    val after = DeltaInterop.snapshot(spark, base)
    assert(after.files.size == 2)
    // exactly one original file survives under its original name
    assert(after.files.map(_.path).toSet.intersect(
      before.files.map(_.path).toSet).size == 1)
    val got = DeltaInterop.read(spark, base)
      .select(sum(col("v"))).head().getDouble(0)
    val expect = (0 until 100).map(i =>
      if (i < 10) i + 1000.0 else i.toDouble).sum
    assert(math.abs(got - expect) < 1e-9)
  }

  test("updateWhere SET is a SIMULTANEOUS assignment (column swap works)") {
    val base = tmp()
    DeltaInterop.overwrite(
      Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)).toDF("k", "a", "b")
        .coalesce(1), base)
    // SQL UPDATE semantics: both RHS see the ORIGINAL row — a
    // sequential fold would make a and b both end as old-b
    DeltaDml.updateWhere(spark, base, col("k") === 1,
      Map("a" -> col("b"), "b" -> col("a")))
    val got = DeltaInterop.read(spark, base)
      .as[(Long, Double, Double)].collect().sorted.toSeq
    assert(got == Seq((1L, 20.0, 10.0), (2L, 30.0, 40.0)))
  }

  test("updateWhere refuses nondeterministic predicates and SET expressions") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    intercept[IllegalArgumentException] {
      DeltaDml.updateWhere(spark, base, rand() < 0.5, Map("id" -> lit(0L)))
    }
    intercept[IllegalArgumentException] {
      DeltaDml.updateWhere(spark, base, col("id") < 5, Map("id" -> (rand() * 10)))
    }
  }

  test("mergeUpsert refuses duplicate source keys (SQL MERGE contract)") {
    val base = tmp()
    DeltaInterop.overwrite(
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1), base)
    val e = intercept[IllegalArgumentException] {
      DeltaDml.mergeUpsert(spark, base,
        Seq((5L, 50.0), (5L, 51.0)).toDF("k", "v"), "k")
    }
    assert(e.getMessage.contains("duplicate"))
    assert(DeltaInterop.read(spark, base).count() == 1) // untouched
  }

  test("DV delete on an already-DV table writes no redundant protocol action") {
    val base = tmp()
    DeltaInterop.overwrite(
      (0L until 30L).map(Tuple1(_)).toDF("id").coalesce(1), base)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") < 3)  // v1: upgrades
    DeltaDml.deleteVectoredWhere(spark, base, col("id") >= 28) // v2: no upgrade
    val log = new java.io.File(base, "_delta_log")
    def hasProto(v: Long) = Files.readString(
      new java.io.File(log, f"$v%020d.json").toPath).contains("\"protocol\"")
    assert(hasProto(1L), "first DV delete must upgrade the protocol")
    assert(!hasProto(2L),
      "a redundant protocol action would make every DV delete look like " +
      "a metadata change to the OCC reconciler")
    assert(DeltaInterop.read(spark, base).count() == 25)
  }

  test("mergeUpsert rewrites only stat-hit files; untouched files survive by name") {
    val base = tmp()
    // two range-clustered files: [0,49] and [50,99]; updates hit only the first
    DeltaInterop.overwrite(
      (0L until 100L).map(i => (i, i * 1.0)).toDF("k", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions(col("k")), base)
    val before = DeltaInterop.snapshot(spark, base)
    assert(before.files.size == 2)
    DeltaDml.mergeUpsert(spark, base,
      Seq((3L, 300.0), (7L, 700.0), (150L, 1500.0)).toDF("k", "v"), "k")
    val after = DeltaInterop.snapshot(spark, base)
    // data skipping: the [50,99] file is untouched (same add.path)
    assert(after.files.map(_.path).toSet.intersect(
      before.files.map(_.path).toSet).size == 1)
    val got = DeltaInterop.read(spark, base).as[(Long, Double)]
      .collect().toMap
    assert(got.size == 101) // 100 originals + 1 insert (150)
    assert(got(3L) == 300.0 && got(7L) == 700.0 && got(150L) == 1500.0)
    assert(got(4L) == 4.0 && got(99L) == 99.0) // survivors untouched
  }

  test("mergeUpsert over a DV-carrying file folds the vector into the rewrite") {
    val base = tmp()
    DeltaInterop.overwrite(
      (0L until 30L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1), base)
    DeltaDml.deleteVectoredWhere(spark, base, col("k") < 5) // DV masks 0..4
    DeltaDml.mergeUpsert(spark, base,
      Seq((10L, -1.0), (2L, 2000.0)).toDF("k", "v"), "k")
    val got = DeltaInterop.read(spark, base).as[(Long, Double)]
      .collect().toMap
    // k=2 was DV-DELETED: the merge re-INSERTS it (unmatched key)
    assert(got(2L) == 2000.0 && got(10L) == -1.0)
    assert(!got.contains(0L) && !got.contains(4L)) // still deleted
    assert(got.size == 26) // 25 live rows (10 updated in place) + re-inserted 2
  }

  test("mergeUpsert CDF: pre/post images for matched keys, insert for new keys") {
    val base = tmp()
    DeltaInterop.overwrite(
      (0L until 20L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1),
      base, configuration = cdfConf)
    DeltaDml.mergeUpsert(spark, base,
      Seq((5L, 55.0), (100L, 1000.0)).toDF("k", "v"), "k")
    val feed = DeltaDml.readChangeFeed(spark, base, fromVersion = 1L)
      .select("_change_type", "k", "v").as[(String, Long, Double)]
      .collect().sorted.toSeq
    assert(feed == Seq(("insert", 100L, 1000.0),
      ("update_postimage", 5L, 55.0), ("update_preimage", 5L, 5.0)))
  }

  test("CDF: delete + update write cdc actions; readChangeFeed returns them verbatim") {
    val base = tmp()
    DeltaInterop.overwrite(
      (0L until 50L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      base, configuration = cdfConf)
    DeltaDml.updateWhere(spark, base, col("id") < 3,
      Map("v" -> (col("v") + 0.5)))                      // v1
    DeltaDml.deleteVectoredWhere(spark, base, col("id") >= 48) // v2
    // cdc actions present in both DML commits
    val log = new java.io.File(base, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    assert(Files.readString(log(1).toPath).contains("\"cdc\""))
    assert(Files.readString(log(2).toPath).contains("\"cdc\""))
    val feed = DeltaDml.readChangeFeed(spark, base, fromVersion = 1L)
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("update_preimage" -> 3L, "update_postimage" -> 3L,
      "delete" -> 2L))
    // value-exact images
    val pre = feed.filter(col("_change_type") === "update_preimage")
      .select("id", "v").as[(Long, Double)].collect().sorted.toSeq
    assert(pre == Seq((0L, 0.0), (1L, 2.0), (2L, 4.0)))
    val post = feed.filter(col("_change_type") === "update_postimage")
      .select("id", "v").as[(Long, Double)].collect().sorted.toSeq
    assert(post == Seq((0L, 0.5), (1L, 2.5), (2L, 4.5)))
    val del = feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq
    assert(del == Seq(48L, 49L))
    // meta columns
    assert(feed.filter(col("_change_type") === "delete")
      .select("_commit_version").distinct().as[Long].collect().toSeq == Seq(2L))
    // the cdc files are INVISIBLE to normal reads
    assert(DeltaInterop.read(spark, base).count() == 48)
  }

  test("CDF fallback without cdc actions: appends are inserts, overwrites diff fully") {
    val base = tmp()
    DeltaInterop.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .coalesce(1), base)                             // v0: 2 inserts
    DeltaInterop.append(Seq((3L, "c")).toDF("k", "s").coalesce(1), base) // v1
    val feed01 = DeltaDml.readChangeFeed(spark, base, fromVersion = 0L)
    assert(feed01.groupBy("_change_type").count().as[(String, Long)]
      .collect().toMap == Map("insert" -> 3L))
    assert(feed01.filter(col("_commit_version") === 1)
      .select("k").as[Long].collect().toSeq == Seq(3L))
  }

  test("CDF fallback is DV-aware: vector delete emits exactly the masked rows") {
    val base = tmp()
    // NO cdf property: the reader must fall back to the file diff
    DeltaInterop.overwrite(
      (0L until 40L).map(i => Tuple1(i)).toDF("id").coalesce(1), base)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") % 10 === 3) // v1
    DeltaDml.deleteVectoredWhere(spark, base, col("id") % 10 === 7) // v2
    val feed = DeltaDml.readChangeFeed(spark, base, fromVersion = 1L)
    val dels = feed.select("_commit_version", "id").as[(Long, Long)]
      .collect().sorted.toSeq
    // v1 masks 3,13,23,33; v2 masks ONLY 7,17,27,37 (not re-emitting v1's)
    assert(feed.select("_change_type").distinct().as[String]
      .collect().toSeq == Seq("delete"))
    assert(dels == Seq((1L, 3L), (1L, 13L), (1L, 23L), (1L, 33L),
      (2L, 7L), (2L, 17L), (2L, 27L), (2L, 37L)))
  }

  test("CDF fallback: RESTORE to a pre-DV state emits resurrected rows as inserts") {
    val base = tmp()
    DeltaInterop.overwrite(
      (0L until 20L).map(i => Tuple1(i)).toDF("id").coalesce(1), base)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") < 5) // v1
    DeltaInterop.restore(spark, base, 0L)                    // v2: resurrect
    val feed = DeltaDml.readChangeFeed(spark, base, fromVersion = 2L,
      toVersion = Some(2L))
    val got = feed.select("_change_type", "id").as[(String, Long)]
      .collect().sorted.toSeq
    assert(got == (0L until 5L).map(i => ("insert", i)))
  }

  test("partitioned CDF: cdc actions carry partitionValues and read back exactly") {
    val base = tmp()
    DeltaInterop.overwrite(
      (0L until 60L).map(i => (i, (i % 3).toString, i * 1.0)).toDF("id", "p", "v"),
      base, partitionBy = Seq("p"), configuration = cdfConf)
    DeltaDml.deleteVectoredWhere(spark, base, col("p") === "1" && col("id") < 10)
    val feed = DeltaDml.readChangeFeed(spark, base, fromVersion = 1L)
    val got = feed.select("id", "p").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "1"), (4L, "1"), (7L, "1")))
    assert(DeltaInterop.read(spark, base).count() == 57)
  }

  test("updateWhere refuses partition-column SET and unknown columns") {
    val base = tmp()
    DeltaInterop.overwrite(Seq((1L, "a", 1.0)).toDF("id", "p", "v"),
      base, partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      DeltaDml.updateWhere(spark, base, lit(true), Map("p" -> lit("b")))
    }
    intercept[IllegalArgumentException] {
      DeltaDml.updateWhere(spark, base, lit(true), Map("zz" -> lit(1)))
    }
  }
}
