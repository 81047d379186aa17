package graft

import java.io.File

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import graft.pipeline.GraftSql
import graft.sources.{DeltaDml, DeltaInterop}

/** Delta liquid clustering (protocol §Clustered Table): CLUSTER BY
  * records the columns in the `delta.clustering` domain; OPTIMIZE
  * clusters INCREMENTALLY — only files not yet clustered at the
  * current columns rewrite (state carried in add.tags), so maintenance
  * cost tracks churn, not table size. */
class LiquidClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_liquid_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def df(ks: Range) =
    ks.map(k => (k.toLong, (k * 37 % 1000).toLong, s"v$k")).toDF("id", "k", "s")

  test("enableClustering records the domain + features; refusals") {
    val base = freshBase("enable")
    DeltaInterop.overwrite(df(0 until 100), base)
    DeltaInterop.enableClustering(spark, base, Seq("k"))
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.writerFeatureSet.contains("clustering"))
    assert(snap.writerFeatureSet.contains("domainMetadata"))
    assert(DeltaInterop.clusteringColumns(snap) == Seq("k"))
    // the domain carries delta-spark's nested-array shape
    val cfg = mapper.readTree(snap.domains("delta.clustering"))
    assert(cfg.get("clusteringColumns").get(0).get(0).asText() == "k")
    // idempotent
    val v = DeltaInterop.enableClustering(spark, base, Seq("k"))
    assert(v == snap.version)
    // refusals: unknown column, too many, partitioned table
    intercept[IllegalArgumentException](
      DeltaInterop.enableClustering(spark, base, Seq("nope")))
    intercept[IllegalArgumentException](
      DeltaInterop.enableClustering(spark, base,
        Seq("id", "k", "s", "id", "k")))
    val part = freshBase("enable_part")
    DeltaInterop.overwrite(df(0 until 10)
      .withColumn("p", col("id") % 2), part, partitionBy = Seq("p"))
    val e = intercept[IllegalArgumentException](
      DeltaInterop.enableClustering(spark, part, Seq("k")))
    assert(e.getMessage.contains("unpartitioned"))
  }

  test("OPTIMIZE clusters incrementally: clustered files survive by name") {
    val base = freshBase("incremental")
    DeltaInterop.overwrite(df(0 until 400).repartition(4), base)
    DeltaInterop.enableClustering(spark, base, Seq("k"))
    assert(DeltaInterop.optimize(spark, base).isDefined)
    val snap1 = DeltaInterop.snapshot(spark, base)
    // every live file is now tagged as clustered at (k)
    assert(snap1.files.nonEmpty)
    snap1.files.foreach { f =>
      assert(f.tags.get("clusteringProvider").contains("liquid"))
      assert(f.tags.get(DeltaInterop.ClusterColsTag).contains("k"))
    }
    val clusteredNames = snap1.files.map(_.path).toSet
    // fresh appends land untagged; the next OPTIMIZE touches ONLY them
    DeltaInterop.append(df(400 until 500).repartition(2), base)
    assert(DeltaInterop.optimize(spark, base).isDefined)
    val snap2 = DeltaInterop.snapshot(spark, base)
    assert(clusteredNames.subsetOf(snap2.files.map(_.path).toSet),
      "previously clustered files must survive by name")
    // nothing left to do → no-op
    assert(DeltaInterop.optimize(spark, base).isEmpty)
    // value invariance through it all
    assert(DeltaInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 500L).sum)
  }

  test("clustered outputs have near-disjoint cluster-key ranges") {
    val base = freshBase("ranges")
    DeltaInterop.overwrite(df(0 until 2000).repartition(6), base)
    DeltaInterop.enableClustering(spark, base, Seq("k"))
    DeltaInterop.optimize(spark, base)
    val snap = DeltaInterop.snapshot(spark, base)
    val bounds = snap.files.map { f =>
      val st = mapper.readTree(f.stats.get)
      (st.get("minValues").get("k").asLong(),
        st.get("maxValues").get("k").asLong())
    }.sortBy(_._1)
    assert(bounds.size >= 2)
    // a range-clustered layout: each file's k-range starts at or after
    // the previous file's start, and overlaps only at boundaries —
    // random placement would interleave ranges wholesale
    val overlapping = bounds.sliding(2).count {
      case Seq((_, hi1), (lo2, _)) => lo2 < hi1
      case _ => false
    }
    assert(overlapping == 0,
      s"clustered file k-ranges interleave: $bounds")
  }

  test("tags survive checkpointing (clustering state outlives compaction)") {
    val base = freshBase("checkpoint")
    DeltaInterop.overwrite(df(0 until 100).repartition(2), base)
    DeltaInterop.enableClustering(spark, base, Seq("k"))
    DeltaInterop.optimize(spark, base)
    DeltaInterop.checkpoint(spark, base)
    // a replay THROUGH the checkpoint still sees the tags
    DeltaInterop.append(df(100 until 110), base)
    val snap = DeltaInterop.snapshot(spark, base)
    val tagged = snap.files.filter(
      _.tags.get(DeltaInterop.ClusterColsTag).contains("k"))
    assert(tagged.nonEmpty)
    // and the incremental OPTIMIZE still skips them
    DeltaInterop.optimize(spark, base)
    val after = DeltaInterop.snapshot(spark, base).files.map(_.path).toSet
    assert(tagged.map(_.path).toSet.subsetOf(after))
  }

  test("ALTER CLUSTER BY re-clusters everything at the next OPTIMIZE") {
    val base = freshBase("alter")
    DeltaInterop.overwrite(df(0 until 300).repartition(3), base)
    DeltaInterop.enableClustering(spark, base, Seq("k"))
    DeltaInterop.optimize(spark, base)
    val oldNames = DeltaInterop.snapshot(spark, base).files.map(_.path).toSet
    DeltaInterop.enableClustering(spark, base, Seq("id"))
    DeltaInterop.optimize(spark, base)
    val snap = DeltaInterop.snapshot(spark, base)
    // every old file was a candidate again — none survives
    assert(snap.files.map(_.path).toSet.intersect(oldNames).isEmpty)
    snap.files.foreach(f =>
      assert(f.tags.get(DeltaInterop.ClusterColsTag).contains("id")))
    assert(DeltaInterop.read(spark, base).count() == 300L)
  }

  test("DV carriers re-cluster and fold their deletes") {
    val base = freshBase("dv")
    DeltaInterop.overwrite(df(0 until 200).repartition(2), base)
    DeltaInterop.enableClustering(spark, base, Seq("k"))
    DeltaInterop.optimize(spark, base)
    DeltaDml.deleteVectoredWhere(spark, base, col("id") % 10 === 7)
    DeltaInterop.optimize(spark, base)
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.files.forall(_.dv.forall(_.cardinality == 0)),
      "re-clustering must fold deletion vectors away")
    assert(DeltaInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 200L).filterNot(_ % 10 == 7).sum)
  }

  test("SQL surface: CREATE ... CLUSTER BY, ALTER ... CLUSTER BY, OPTIMIZE") {
    val base = freshBase("sql")
    GraftSql.sql(spark,
      s"""CREATE TABLE liquid_sql_t (id BIGINT, k BIGINT, s STRING)
          USING delta CLUSTER BY (k) LOCATION '$base'""")
    val snap0 = DeltaInterop.snapshot(spark, base)
    assert(DeltaInterop.clusteringColumns(snap0) == Seq("k"))
    spark.range(500).select(col("id"), (col("id") * 37 % 1000).as("k"),
        concat(lit("v"), col("id")).as("s"))
      .createOrReplaceTempView("liquid_src")
    GraftSql.sql(spark,
      "INSERT INTO liquid_sql_t SELECT id, k, s FROM liquid_src")
    GraftSql.sql(spark, "OPTIMIZE liquid_sql_t")
    val snap1 = DeltaInterop.snapshot(spark, base)
    assert(snap1.files.forall(
      _.tags.get(DeltaInterop.ClusterColsTag).contains("k")))
    GraftSql.sql(spark, "ALTER TABLE liquid_sql_t CLUSTER BY (id)")
    assert(DeltaInterop.clusteringColumns(
      DeltaInterop.snapshot(spark, base)) == Seq("id"))
    assert(spark.sql("SELECT sum(id) AS s FROM liquid_sql_t")
      .head().getLong(0) == (0L until 500L).sum)
    // non-Delta targets refuse
    val lg = freshBase("sql_log")
    graft.pipeline.GraftLog.overwrite(
      Seq((1L, 2L)).toDF("a", "b"), lg)
    GraftSql.registerTable(spark, "liquid_log_t", lg)
    val e = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "ALTER TABLE liquid_log_t CLUSTER BY (a)"))
    assert(e.getMessage.contains("Delta"))
  }

  test("increments form an LSM hierarchy: cube count stays logarithmic " +
       "under churn") {
    val base = freshBase("lsm")
    DeltaInterop.overwrite(df(0 until 200).repartition(2), base)
    DeltaInterop.enableClustering(spark, base, Seq("k"))
    DeltaInterop.optimize(spark, base)
    // 10 churn+OPTIMIZE rounds; single-level accretion would leave ~11
    // overlapping increments — the fan-in-4 hierarchy must keep the
    // cube count (and so the z-range overlap any point scan pays)
    // bounded by (fanIn-1)·levels+1
    (1 to 10).foreach { r =>
      DeltaInterop.append(df(200 * r until 200 * (r + 1)).repartition(2), base)
      assert(DeltaInterop.optimize(spark, base).isDefined)
    }
    val snap = DeltaInterop.snapshot(spark, base)
    val cubes = snap.files.flatMap(_.tags.get(DeltaInterop.ClusterCubeTag))
      .distinct
    assert(snap.files.forall(_.tags.contains(DeltaInterop.ClusterCubeTag)))
    assert(cubes.size <= 5, s"11 rounds left ${cubes.size} cubes — " +
      "the hierarchy is not merging")
    // file-skip bound: no point of the key space is covered by more
    // files than there are cubes (each cube is internally disjoint)
    val bounds = snap.files.map { f =>
      val st = mapper.readTree(f.stats.get)
      (st.get("minValues").get("k").asLong(),
        st.get("maxValues").get("k").asLong())
    }
    val worstOverlap = (0L until 1000L by 37L).map(p =>
      bounds.count { case (lo, hi) => lo <= p && p <= hi }).max
    assert(worstOverlap <= cubes.size,
      s"point overlap $worstOverlap exceeds cube count ${cubes.size}")
    // values invariant through every merge
    assert(DeltaInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 2200L).sum)
    // and a final no-op when nothing changed
    assert(DeltaInterop.optimize(spark, base).isEmpty)
  }

  test("CLUSTER BY NONE drops clustering metadata-only; re-enable works") {
    val base = freshBase("none")
    DeltaInterop.overwrite(df(0 until 300).repartition(3), base)
    DeltaInterop.enableClustering(spark, base, Seq("k"))
    DeltaInterop.optimize(spark, base)
    val filesBefore = DeltaInterop.snapshot(spark, base).files.map(_.path)
    GraftSql.registerDeltaTable(spark, "liquid_none_t", base)
    GraftSql.sql(spark, "ALTER TABLE liquid_none_t CLUSTER BY NONE")
    val snap = DeltaInterop.snapshot(spark, base)
    assert(DeltaInterop.clusteringColumns(snap).isEmpty)
    // metadata-only: no data file moved
    assert(snap.files.map(_.path) == filesBefore)
    // idempotent
    val v = snap.version
    assert(DeltaInterop.disableClustering(spark, base) == v)
    // OPTIMIZE now bin-packs instead of clustering (no liquid tags on
    // its outputs)
    DeltaInterop.append(df(300 until 320).repartition(4), base)
    DeltaInterop.optimize(spark, base, smallFileBytes = 1L << 30)
    val packed = DeltaInterop.snapshot(spark, base)
    assert(packed.files.exists(!_.tags.contains("clusteringProvider")))
    // re-enable clusters fresh churn again
    DeltaInterop.enableClustering(spark, base, Seq("k"))
    assert(DeltaInterop.optimize(spark, base).isDefined)
    assert(DeltaInterop.read(spark, base).agg(sum("id")).head().getLong(0)
      == (0L until 320L).sum)
  }
}
