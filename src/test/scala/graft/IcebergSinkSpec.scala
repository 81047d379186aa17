package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop
import graft.streaming.EventStreams

/** Exactly-once Iceberg streaming sink (snapshot-summary batch ids —
  * the Iceberg analogue of Delta txn identifiers) and the
  * single-snapshot equality-delete MERGE it pairs with. */
class IcebergSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("ice_sink_").toFile
    d.deleteOnExit(); d.getPath
  }

  private def formatVersionOf(base: String): Int = {
    val v = Files.readString(
      new java.io.File(base, "metadata/version-hint.text").toPath).trim
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(Files.readString(
        new java.io.File(base, s"metadata/v$v.metadata.json").toPath))
      .get("format-version").asInt()
  }

  test("appendIdempotent creates the table and gates replays") {
    val base = tmp()
    val df = spark.range(10).toDF("id").coalesce(1)
    assert(IcebergInterop.appendIdempotent(df, base, "app-1", 0L))
    assert(IcebergInterop.read(spark, base).count() == 10)
    // poisoned replay of batch 0 — skipped, no snapshot, nothing staged
    val before = IcebergInterop.snapshotIds(base)
    assert(!IcebergInterop.appendIdempotent(df, base, "app-1", 0L))
    assert(IcebergInterop.snapshotIds(base) == before)
    assert(IcebergInterop.read(spark, base).count() == 10)
    // an OLDER batch must also be skipped (monotone gate)
    assert(IcebergInterop.appendIdempotent(df, base, "app-1", 5L))
    assert(!IcebergInterop.appendIdempotent(df, base, "app-1", 3L))
    assert(IcebergInterop.lastBatchId(base, "app-1") == 5L)
    // a DIFFERENT app id is independent
    assert(IcebergInterop.appendIdempotent(df, base, "app-2", 0L))
    assert(IcebergInterop.read(spark, base).count() == 30)
    assert(IcebergInterop.lastBatchId(base, "nope") == -1L)
  }

  test("streamIngestIceberg is exactly-once across a restart") {
    val base = tmp()
    val srcDir = tmp()
    val ckpt = tmp() + "/ckpt"
    spark.range(100).select(col("id"), (col("id") % 4).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    def stream() = spark.readStream
      .schema("id LONG, k LONG").parquet(srcDir)
    EventStreams.streamIngestIceberg(stream(), base,
      appId = Some("restart-test"), checkpoint = Some(ckpt))
    assert(IcebergInterop.read(spark, base).count() == 100)
    // restart with the SAME checkpoint: no new input → no new commits
    EventStreams.streamIngestIceberg(stream(), base,
      appId = Some("restart-test"), checkpoint = Some(ckpt))
    val got = IcebergInterop.read(spark, base)
    assert(got.count() == 100)
    assert(got.agg(sum("id")).head().getLong(0) == (0 until 100).sum)
    // new file arrives → only IT is ingested on the next run
    spark.range(100, 120).select(col("id"), (col("id") % 4).as("k"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    EventStreams.streamIngestIceberg(stream(), base,
      appId = Some("restart-test"), checkpoint = Some(ckpt))
    assert(IcebergInterop.read(spark, base).count() == 120)
    // streamed small files fold away with the maintenance compaction
    IcebergInterop.rewriteDataFiles(spark, base)
    assert(IcebergInterop.read(spark, base).count() == 120)
  }

  test("streaming into a v3 table: exactly-once holds and each batch " +
       "claims its own row-lineage id space") {
    val base = tmp()
    val df0 = spark.range(10).toDF("id").coalesce(1)
    assert(IcebergInterop.appendIdempotent(df0, base, "v3app", 0L,
      formatVersion = 3))
    assert(formatVersionOf(base) == 3)
    val df1 = spark.range(10, 16).toDF("id").coalesce(1)
    assert(IcebergInterop.appendIdempotent(df1, base, "v3app", 1L))
    // replay-poisoned batch 1 → skipped, no snapshot, no id space burned
    val idsBefore = IcebergInterop.snapshotIds(base)
    assert(!IcebergInterop.appendIdempotent(df1, base, "v3app", 1L))
    assert(IcebergInterop.snapshotIds(base) == idsBefore)
    val df2 = spark.range(16, 20).toDF("id").coalesce(1)
    assert(IcebergInterop.appendIdempotent(df2, base, "v3app", 2L))
    // lineage: every row has an id, all unique ACROSS batches, and the
    // overall space is the contiguous 0..n-1 the inheritance assigns
    val withIds = IcebergInterop.readWithRowIds(spark, base)
      .select(col("id"), col(IcebergInterop.RowIdCol)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withIds.size == 20)
    assert(withIds.values.toSeq.sorted == (0L until 20L).toSeq,
      s"row ids must be 0..19, got ${withIds.values.toSeq.sorted}")
    // a DV delete on the streamed table keeps survivors' ids stable
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 3)
    val after = IcebergInterop.readWithRowIds(spark, base)
      .select(col("id"), col(IcebergInterop.RowIdCol)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.size == 17)
    after.foreach { case (id, rid) => assert(withIds(id) == rid) }
  }

  test("streamIngestIceberg with formatVersion=3 creates a v3 table " +
       "exactly-once across a restart") {
    val base = tmp(); val srcDir = tmp(); val ckpt = tmp() + "/ckpt"
    spark.range(50).toDF("id")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    def stream() = spark.readStream.schema("id LONG").parquet(srcDir)
    EventStreams.streamIngestIceberg(stream(), base,
      appId = Some("v3-restart"), checkpoint = Some(ckpt),
      formatVersion = 3)
    assert(formatVersionOf(base) == 3)
    assert(IcebergInterop.read(spark, base).count() == 50)
    // restart, same checkpoint: no new input → no new commits, and the
    // lineage space is not burned by the no-op run
    EventStreams.streamIngestIceberg(stream(), base,
      appId = Some("v3-restart"), checkpoint = Some(ckpt),
      formatVersion = 3)
    val ids = IcebergInterop.readWithRowIds(spark, base)
      .select(col(IcebergInterop.RowIdCol)).collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == (0L until 50L).toSeq)
  }

  test("appends inherit a partitioned table's spec instead of erasing it") {
    val base = tmp()
    def rows(a: Long, b: Long) =
      spark.range(a, b).select(col("id"), (col("id") % 4).as("k"))
    IcebergInterop.overwrite(rows(0, 20), base, partitionBy = Seq("k"))
    // streaming-sink shape: appendIdempotent with NO partitionBy hint —
    // the commit must carry the table's spec forward, not erase it
    assert(IcebergInterop.appendIdempotent(rows(20, 30), base, "app-p", 0L))
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.partitionColumns == Seq("k"))
    assert(snap.specFields.map(f => (f.name, f.transform)) ==
      Seq(("k", "identity")))
    // plain append inherits too
    IcebergInterop.append(rows(30, 34), base)
    assert(IcebergInterop.snapshot(spark, base).partitionColumns == Seq("k"))
    val all = IcebergInterop.read(spark, base)
    assert(all.count() == 34)
    // partition pruning still serves after the unhinted appends
    val k1 = IcebergInterop.read(spark, base,
      partitionFilters = Map("k" -> "1"))
    assert(k1.count() == all.filter(col("k") === 1L).count())
    // a MISMATCHED partitionBy refuses instead of repartitioning
    intercept[IllegalArgumentException] {
      IcebergInterop.append(rows(34, 38), base, partitionBy = Seq("id"))
    }
  }

  test("appendIdempotent preserves a transformed (bucket) partition spec") {
    val base = tmp()
    def rows(a: Long, b: Long) =
      spark.range(a, b).select(col("id"), (col("id") * 7 % 100).as("k"))
    IcebergInterop.overwriteTransformed(rows(0, 50), base,
      Seq("k" -> IcebergInterop.IceTransform.Bucket(4)))
    assert(IcebergInterop.appendIdempotent(rows(50, 80), base, "app-b", 0L))
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.specFields.map(_.transform) == Seq("bucket[4]"))
    // transform-aware pruning still answers point lookups exactly
    val got = IcebergInterop.readEq(spark, base, Map("k" -> 49L))
    assert(got.count() ==
      IcebergInterop.read(spark, base).filter(col("k") === 49L).count())
  }

  test("mergeUpsert replaces matched keys and inserts new ones atomically") {
    val base = tmp()
    IcebergInterop.overwrite(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v").coalesce(1), base)
    val before = IcebergInterop.snapshotIds(base).size
    IcebergInterop.mergeUpsert(spark, base,
      Seq((2L, 22.0), (9L, 90.0)).toDF("k", "v"), Seq("k"))
    // ONE new snapshot for the whole upsert
    assert(IcebergInterop.snapshotIds(base).size == before + 1)
    val got = IcebergInterop.read(spark, base).as[(Long, Double)]
      .collect().sorted.toSeq
    assert(got == Seq((1L, 10.0), (2L, 22.0), (3L, 30.0), (9L, 90.0)))
    // merge-on-read: the original data file was NOT rewritten; an
    // equality delete carries the retirement
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.eqDeletes.nonEmpty, "merge must not rewrite data files")
    // a second merge composes (strict sequence gate: the first merge's
    // own rows are killable by the second's delete)
    IcebergInterop.mergeUpsert(spark, base,
      Seq((9L, 99.0), (2L, 2.0)).toDF("k", "v"), Seq("k"))
    assert(IcebergInterop.read(spark, base).as[(Long, Double)]
      .collect().sorted.toSeq ==
      Seq((1L, 10.0), (2L, 2.0), (3L, 30.0), (9L, 99.0)))
    // fold it all away: compaction clears the delete files, values hold
    IcebergInterop.rewriteDataFiles(spark, base)
    val after = IcebergInterop.snapshot(spark, base)
    assert(after.eqDeletes.isEmpty)
    assert(IcebergInterop.read(spark, base).as[(Long, Double)]
      .collect().sorted.toSeq ==
      Seq((1L, 10.0), (2L, 2.0), (3L, 30.0), (9L, 99.0)))
  }

  test("mergeUpsert on an identity-partitioned table keeps partition pruning") {
    val base = tmp()
    IcebergInterop.overwrite(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "p", "v"), base,
      partitionBy = Seq("p"))
    IcebergInterop.mergeUpsert(spark, base,
      Seq((2L, "b", 22.0), (5L, "a", 5.0)).toDF("k", "p", "v"), Seq("k"))
    assert(IcebergInterop.read(spark, base,
        partitionFilters = Map("p" -> "a")).as[(Long, String, Double)]
      .collect().sorted.toSeq == Seq((1L, "a", 1.0), (5L, "a", 5.0)))
    assert(IcebergInterop.read(spark, base).count() == 3)
  }

  test("updateWhere rewrites only touched files; untouched survive by name") {
    val base = tmp()
    IcebergInterop.overwrite(
      (0L until 20L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1), base)
    IcebergInterop.append(
      (100L until 120L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1),
      base)
    val before = IcebergInterop.snapshot(spark, base)
    val untouchedRaw = before.files.map(_.rawPath).toSet
    IcebergInterop.updateWhere(spark, base, col("k") >= 100,
      Map("v" -> (col("v") + 1000)))
    val after = IcebergInterop.snapshot(spark, base)
    // the first file holds no match: it survives BY NAME
    assert(after.files.map(_.rawPath).toSet.intersect(untouchedRaw).size == 1,
      s"expected exactly one survivor: ${after.files.map(_.rawPath)}")
    val got = IcebergInterop.read(spark, base).as[(Long, Double)]
      .collect().sorted.toSeq
    val want = (0L until 20L).map(i => (i, i * 1.0)) ++
      (100L until 120L).map(i => (i, i * 1.0 + 1000))
    assert(got == want)
  }

  test("updateWhere folds the file's deletes and is a simultaneous swap") {
    val base = tmp()
    IcebergInterop.overwrite(
      (0L until 10L).map(i => (i, i * 1.0, i * 10.0)).toDF("k", "a", "b")
        .coalesce(1), base)
    IcebergInterop.deletePositionsWhere(spark, base, col("k") === 9)
    // swap a and b on k<3: every RHS must see the ORIGINAL row
    IcebergInterop.updateWhere(spark, base, col("k") < 3,
      Map("a" -> col("b"), "b" -> col("a")))
    val after = IcebergInterop.snapshot(spark, base)
    // the delete folded into the rewrite: no live delete files remain
    assert(after.deletes.isEmpty)
    val got = IcebergInterop.read(spark, base).as[(Long, Double, Double)]
      .collect().sorted.toSeq
    val want = (0L until 9L).map(i =>
      if (i < 3) (i, i * 10.0, i * 1.0) else (i, i * 1.0, i * 10.0))
    assert(got == want)
    // no-match update commits nothing
    val cur = after.snapshotId
    assert(IcebergInterop.updateWhere(spark, base, col("k") === 777L,
      Map("a" -> lit(0.0))) == cur)
    // partition-column SET refuses
    val pbase = tmp()
    IcebergInterop.overwrite(Seq((1L, "x", 1.0)).toDF("k", "p", "v"), pbase,
      partitionBy = Seq("p"))
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.updateWhere(spark, pbase, lit(true), Map("p" -> lit("y")))
    }
    assert(e.getMessage.contains("partition column"))
  }

  test("mergeUpsert refuses duplicate source keys and wrong columns") {
    val base = tmp()
    IcebergInterop.overwrite(Seq((1L, 1.0)).toDF("k", "v").coalesce(1), base)
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.mergeUpsert(spark, base,
        Seq((1L, 2.0), (1L, 3.0)).toDF("k", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("duplicate"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergInterop.mergeUpsert(spark, base,
        Seq((1L, 2.0)).toDF("k", "other"), Seq("k"))
    }
    assert(e2.getMessage.contains("table columns"))
    // NULL merge keys: SQL MERGE equality never matches NULL, the
    // equality-delete file WOULD (null-safe) — must refuse, not
    // silently delete the target's null-keyed rows
    val e3 = intercept[IllegalArgumentException] {
      IcebergInterop.mergeUpsert(spark, base,
        Seq((Some(2L), 2.0), (None, 3.0)).toDF("k", "v"), Seq("k"))
    }
    assert(e3.getMessage.contains("NULL"))
  }
}
