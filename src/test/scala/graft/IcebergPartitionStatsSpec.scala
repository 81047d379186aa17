package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop

/** Iceberg partition statistics (spec §Partition Statistics): one
  * parquet file per compute with exact per-partition data/delete
  * aggregates, recorded in table metadata, carried across commits,
  * and GC-protected. The honest-total contract: total_record_count
  * (live rows) is emitted only when exact — data rows minus
  * position-deleted rows — and omitted when equality deletes could
  * touch the partition. */
class IcebergPartitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_pstats_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  test("per-partition aggregates are exact; identity fields typed") {
    val base = freshBase("exact")
    val df = (0L until 300L).map(k => (k, (k % 3).toInt, s"r$k"))
      .toDF("id", "p", "tag")
    IcebergInterop.overwrite(df.repartition(4), base, partitionBy = Seq("p"))
    IcebergInterop.computePartitionStats(spark, base)
    val stats = IcebergInterop.partitionStats(spark, base).get
    assert(stats.schema("p").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val got = stats.select("p", "data_record_count", "total_record_count")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(0 -> ((100L, 100L)), 1 -> ((100L, 100L)),
      2 -> ((100L, 100L))))
    assert(stats.agg(sum("data_file_count")).head().getLong(0) >= 3)
  }

  test("position deletes attribute to their partition; totals stay exact") {
    val base = freshBase("posdel")
    val df = (0L until 200L).map(k => (k, (k % 2).toInt))
      .toDF("id", "p")
    IcebergInterop.overwrite(df.repartition(2), base, partitionBy = Seq("p"))
    // v2 merge-on-read delete of ids 0..19 (all in both partitions)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 20)
    IcebergInterop.computePartitionStats(spark, base)
    val stats = IcebergInterop.partitionStats(spark, base).get
    val byP = stats.select("p", "data_record_count",
        "position_delete_record_count", "total_record_count")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byP(0) == ((100L, 10L, 90L)))
    assert(byP(1) == ((100L, 10L, 90L)))
    // the live-row total matches the actual read
    assert(stats.agg(sum("total_record_count")).head().getLong(0) ==
      IcebergInterop.read(spark, base).count())
  }

  test("equality deletes report under the null partition; totals omitted") {
    val base = freshBase("eqdel")
    IcebergInterop.overwrite(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s").coalesce(1), base)
    IcebergInterop.addEqualityDeletes(spark, base,
      Seq((2L, "b")).toDF("k", "s"), Seq("k"))
    IcebergInterop.computePartitionStats(spark, base)
    val stats = IcebergInterop.partitionStats(spark, base).get
    assert(stats.agg(sum("equality_delete_record_count"))
      .head().getLong(0) == 1L)
    // a wrong "accurate count" is worse than an absent optional field
    assert(stats.where(col("total_record_count").isNotNull).count() == 0)
  }

  test("ANALYZE TABLE COMPUTE STATISTICS publishes and returns the stats") {
    import graft.pipeline.GraftSql
    val base = freshBase("sql")
    val df = (0L until 90L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
    IcebergInterop.overwrite(df.repartition(3), base, partitionBy = Seq("p"))
    GraftSql.registerIcebergTable(spark, "pstats_sql_t", base)
    val out = GraftSql.sql(spark, "ANALYZE TABLE pstats_sql_t COMPUTE STATISTICS")
    assert(out.select(sum("data_record_count")).head().getLong(0) == 90L)
    assert(IcebergInterop.partitionStats(spark, base).isDefined)
    // partition-scoped analyze refuses (the file covers the whole table)
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ANALYZE TABLE pstats_sql_t PARTITION (p=1) COMPUTE STATISTICS"))
    assert(e.getMessage.contains("PARTITION"))
    // Delta tables refuse with guidance
    val dbase = freshBase("sql_delta")
    graft.sources.DeltaInterop.overwrite(df.coalesce(1), dbase)
    GraftSql.registerDeltaTable(spark, "pstats_sql_d", dbase)
    val e2 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ANALYZE TABLE pstats_sql_d COMPUTE STATISTICS"))
    assert(e2.getMessage.contains("Iceberg feature"))
  }

  test("appends refresh incrementally; result equals the full census") {
    val base = freshBase("incr")
    val df = (0L until 90L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
    IcebergInterop.overwrite(df.repartition(3), base, partitionBy = Seq("p"))
    IcebergInterop.computePartitionStats(spark, base)
    // two appends: one into existing partitions, one creating p=3
    IcebergInterop.append((90L until 120L).map(k => (k, (k % 2).toInt))
      .toDF("id", "p").coalesce(1), base, partitionBy = Seq("p"))
    IcebergInterop.append((120L until 130L).map(k => (k, 3))
      .toDF("id", "p").coalesce(1), base, partitionBy = Seq("p"))
    IcebergInterop.computePartitionStats(spark, base)
    def rows() = IcebergInterop.partitionStats(spark, base).get
      .select("p", "data_record_count", "data_file_count",
        "total_record_count")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSet
    val incremental = rows()
    IcebergInterop.computePartitionStats(spark, base, incremental = false)
    assert(rows() == incremental, s"incremental diverged from full")
    assert(incremental.toSeq.map(_._2).sum == 130L, incremental.toString)
    assert(incremental.exists(_._1 == 3))
  }

  test("the incremental path never re-reads delete parquets") {
    val base = freshBase("incr_nodel")
    val df = (0L until 100L).map(k => (k, (k % 2).toInt)).toDF("id", "p")
    IcebergInterop.overwrite(df.repartition(2), base, partitionBy = Seq("p"))
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 10)
    IcebergInterop.computePartitionStats(spark, base) // full: scans deletes
    IcebergInterop.append((100L until 120L).map(k => (k, (k % 2).toInt))
      .toDF("id", "p").coalesce(1), base, partitionBy = Seq("p"))
    // corrupt the classic delete parquet ON DISK: the incremental
    // refresh must still succeed (it merges metadata only), while a
    // full recompute would have to re-scan it and fail
    val classic = IcebergInterop.snapshot(spark, base).deletes
      .filter(!_.referencedDataFile.isDefined)
    assume(classic.nonEmpty)
    classic.foreach(d => java.nio.file.Files.write(
      java.nio.file.Paths.get(d.path), "not parquet".getBytes))
    IcebergInterop.computePartitionStats(spark, base)
    val byP = IcebergInterop.partitionStats(spark, base).get
      .select("p", "data_record_count", "position_delete_record_count",
        "total_record_count")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byP(0) == ((60L, 5L, 55L)) && byP(1) == ((60L, 5L, 55L)), byP)
    intercept[Exception](IcebergInterop.computePartitionStats(
      spark, base, incremental = false))
  }

  test("a non-append snapshot in the chain falls back to the full census") {
    val base = freshBase("incr_fallback")
    val df = (0L until 60L).map(k => (k, (k % 2).toInt)).toDF("id", "p")
    IcebergInterop.overwrite(df.repartition(2), base, partitionBy = Seq("p"))
    IcebergInterop.computePartitionStats(spark, base)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 6)
    IcebergInterop.computePartitionStats(spark, base) // must go full
    val byP = IcebergInterop.partitionStats(spark, base).get
      .select("p", "position_delete_record_count", "total_record_count")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byP(0) == ((3L, 27L)) && byP(1) == ((3L, 27L)), byP)
  }

  test("entries carry across commits, expire drops them, GC pins the file") {
    val base = freshBase("lifecycle")
    IcebergInterop.overwrite((0L until 50L).toDF("id").coalesce(1), base)
    IcebergInterop.computePartitionStats(spark, base)
    // carried across a data commit
    IcebergInterop.append((50L until 80L).toDF("id").coalesce(1), base)
    assert(IcebergInterop.partitionStats(spark, base).isDefined)
    // never reaped as an orphan (both GC modes)
    val cutoff = Some(System.currentTimeMillis() + 60000L)
    for (fan <- Seq(1000000, 1)) {
      spark.conf.set("graft.gc.fanout", fan.toString)
      val reaped = try IcebergInterop.removeOrphanFiles(
        spark, base, cutoff, dryRun = true)
      finally spark.conf.unset("graft.gc.fanout")
      assert(!reaped.exists(_.contains("partition-stats")),
        s"fanout=$fan would reap the stats file: $reaped")
    }
    // expiring the analyzed snapshot takes the entry and file with it
    IcebergInterop.overwrite((100L until 120L).toDF("id").coalesce(1), base)
    val reclaimed = IcebergInterop.expireSnapshots(spark, base)
    assert(reclaimed.exists(_.contains("partition-stats")),
      reclaimed.toString)
    assert(IcebergInterop.partitionStats(spark, base).isEmpty)
  }
}
