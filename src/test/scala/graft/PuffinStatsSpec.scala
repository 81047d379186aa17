package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.{IcebergInterop, Puffin}

/** Iceberg table statistics: per-column NDV as puffin
  * `apache-datasketches-theta-v1` blobs — REAL Apache DataSketches
  * compact theta sketches (the library Spark ships is the known-answer
  * reference), recorded in table metadata §Table Statistics and read
  * back into planning hints (the broadcast-side choice a size-only
  * planner cannot make when a dimension is wide on disk but small in
  * rows). */
class PuffinStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_puffinstats_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  test("statsFileBytes round-trips blobs vs the datasketches known answer") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{Sketches, UpdateSketch}
    // the reference sketch: the real library over a known value set
    val sk = UpdateSketch.builder().build()
    (1L to 500L).foreach(sk.update)
    val refBytes = sk.compact(true, null).toByteArray
    // compact-ordered serial image: serVer 3, family 3 (COMPACT) —
    // the on-the-wire contract every external reader checks
    assert(refBytes(1) == 3, "SerVer must be 3")
    assert(refBytes(2) == 3, "Family must be COMPACT (3)")
    val (fileBytes, footerSize, locs) = Puffin.statsFileBytes(Seq(
      Puffin.StatsBlob(Puffin.ThetaBlobType, Seq(1), 7L, 4L, refBytes,
        Map("ndv" -> "500"))))
    assert(footerSize > 0 && locs.size == 1)
    val got = Puffin.statsBlobs(fileBytes)
    assert(got.size == 1)
    val (tpe, fields, off, len, props) = got.head
    assert(tpe == Puffin.ThetaBlobType && fields == Seq(1))
    assert(props("ndv") == "500")
    // blob bytes byte-identical through the container, estimate exact
    val back = java.util.Arrays.copyOfRange(fileBytes,
      off.toInt, (off + len).toInt)
    assert(java.util.Arrays.equals(back, refBytes))
    assert(Math.round(
      Sketches.wrapSketch(Memory.wrap(back)).getEstimate) == 500L)
  }

  test("computeNdvStats publishes a statistics file; ndvEstimate reads it back") {
    val base = freshBase("compute")
    val df = (0L until 3000L).map(k => (k, k % 40, s"c${k % 7}"))
      .toDF("id", "custkey", "cat").repartition(4)
    IcebergInterop.overwrite(df, base)
    val ndv = IcebergInterop.computeNdvStats(spark, base,
      Seq("id", "custkey", "cat"))
    // theta is EXACT below its nominal 4096 entries
    assert(ndv("id") == 3000L && ndv("custkey") == 40L && ndv("cat") == 7L)
    assert(IcebergInterop.ndvEstimate(base, "custkey").map(_._2)
      .contains(40L))
    assert(IcebergInterop.ndvEstimate(base, "nope").isEmpty)
    // the metadata records the spec's statistics entry
    val meta = new String(java.nio.file.Files.readAllBytes(new File(base,
      "metadata").listFiles().filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json")
        .toLong).toPath))
    assert(meta.contains("\"statistics\"") &&
      meta.contains(Puffin.ThetaBlobType))
  }

  test("NDV-informed broadcast: the sketched dim broadcasts, the control does not") {
    val base = freshBase("bcast")
    // a dim WIDE on disk (fat payload column) but small in keys
    val dim = (0L until 200L).map(k => (k, "x" * 2000))
      .toDF("custkey", "payload").repartition(2)
    IcebergInterop.overwrite(dim, base)
    IcebergInterop.computeNdvStats(spark, base, Seq("custkey"))
    val fact = spark.range(100000).select(
      (col("id") % 200).as("custkey"), (col("id") * 2).as("v"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val control = fact.join(
        IcebergInterop.read(spark, base), Seq("custkey"))
      assert(!control.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "control must not broadcast with auto-broadcast off")
      val hinted = fact.join(IcebergInterop.readWithNdvBroadcast(
        spark, base, Seq("custkey"), maxNdv = 1000L), Seq("custkey"))
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "NDV-informed read must broadcast the small-key dim")
      // over-threshold NDV falls back to the planner's choice
      val tooBig = fact.join(IcebergInterop.readWithNdvBroadcast(
        spark, base, Seq("custkey"), maxNdv = 10L), Seq("custkey"))
      assert(!tooBig.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(hinted.agg(sum("v")).head().getLong(0) ==
        control.agg(sum("v")).head().getLong(0))
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("remove_orphan_files never reaps the statistics file") {
    val base = freshBase("orphan")
    IcebergInterop.overwrite((0L until 100L).toDF("id").coalesce(1), base)
    IcebergInterop.computeNdvStats(spark, base, Seq("id"))
    val cutoff = Some(System.currentTimeMillis() + 60000L)
    for (fan <- Seq(1000000, 1)) {
      spark.conf.set("graft.gc.fanout", fan.toString)
      val reaped = try IcebergInterop.removeOrphanFiles(
        spark, base, cutoff, dryRun = true)
      finally spark.conf.unset("graft.gc.fanout")
      assert(!reaped.exists(_.endsWith(".stats")),
        s"fanout=$fan reclaim plan contains the stats file: $reaped")
    }
    assert(IcebergInterop.ndvEstimate(base, "id").map(_._2).contains(100L))
  }

  test("ANALYZE TABLE SQL routes to the statistics file; refusals") {
    import graft.pipeline.GraftSql
    val base = freshBase("analyze")
    IcebergInterop.overwrite((0L until 500L).map(k => (k, k % 25, "x" * 3))
      .toDF("id", "g", "blobish").coalesce(1), base)
    GraftSql.registerIcebergTable(spark, "puffin_an_t", base)
    val out = GraftSql.sql(spark,
      "ANALYZE TABLE puffin_an_t COMPUTE STATISTICS FOR COLUMNS id, g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("id" -> 500L, "g" -> 25L))
    assert(IcebergInterop.ndvEstimate(base, "g").map(_._2).contains(25L))
    // ALL COLUMNS covers every sketchable column
    val all = GraftSql.sql(spark,
      "ANALYZE TABLE puffin_an_t COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect().map(_.getString(0)).toSet
    assert(all == Set("id", "g", "blobish"))
    // non-Iceberg tables refuse with guidance
    val dbase = freshBase("analyze_delta")
    graft.sources.DeltaInterop.overwrite((0L until 5L).toDF("id"), dbase)
    GraftSql.registerDeltaTable(spark, "puffin_an_d", dbase)
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ANALYZE TABLE puffin_an_d COMPUTE STATISTICS FOR COLUMNS id"))
    assert(e.getMessage.contains("Iceberg"), e.getMessage)
  }

  test("un-sketchable columns refuse instead of silently sketching nothing") {
    val base = freshBase("unsketchable")
    IcebergInterop.overwrite(
      (0L until 10L).map(k => (k, Array[Byte](k.toByte)))
        .toDF("id", "payload").coalesce(1), base)
    val e = intercept[IllegalArgumentException](
      IcebergInterop.computeNdvStats(spark, base, Seq("payload")))
    assert(e.getMessage.contains("not NDV-sketchable"), e.getMessage)
  }

  test("expireSnapshots drops statistics files of expired snapshots") {
    val base = freshBase("expire")
    IcebergInterop.overwrite((0L until 40L).toDF("id").coalesce(1), base)
    IcebergInterop.computeNdvStats(spark, base, Seq("id"))
    val statsFile = new File(base, "metadata").list()
      .find(_.endsWith(".stats")).get
    // a full rewrite strands the analyzed snapshot; expiring it must
    // take the now-unresolvable statistics entry and file with it
    IcebergInterop.overwrite((40L until 90L).toDF("id").coalesce(1), base)
    val reclaimed = IcebergInterop.expireSnapshots(spark, base)
    assert(reclaimed.exists(_.endsWith(".stats")), reclaimed.toString)
    assert(!new File(base, s"metadata/$statsFile").exists())
    assert(IcebergInterop.ndvEstimate(base, "id").isEmpty)
    // re-analyzing the current snapshot works and survives expire
    IcebergInterop.computeNdvStats(spark, base, Seq("id"))
    assert(IcebergInterop.ndvEstimate(base, "id").map(_._2).contains(50L))
  }

  test("compaction refreshes the sketches at the new snapshot") {
    val base = freshBase("refresh")
    IcebergInterop.overwrite(
      (0L until 50L).map(k => (k, k % 5)).toDF("id", "g").repartition(3), base)
    IcebergInterop.computeNdvStats(spark, base, Seq("id"))
    val (snap0, _) = IcebergInterop.ndvEstimate(base, "id").get
    IcebergInterop.append(
      (50L until 120L).map(k => (k, k % 5)).toDF("id", "g").repartition(3), base)
    IcebergInterop.rewriteDataFiles(spark, base,
      smallFileBytes = 1L << 30, targetFileBytes = 1L << 30)
    val (snap1, ndv1) = IcebergInterop.ndvEstimate(base, "id").get
    assert(snap1 != snap0, "stats must re-key to the compacted snapshot")
    assert(ndv1 == 120L, s"refreshed NDV must see the appended keys: $ndv1")
  }
}
