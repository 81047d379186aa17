package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{DeltaDml, DeltaInterop}

/** In-commit timestamps (Delta protocol §In-Commit Timestamps): once
  * enabled, every commit's commitInfo carries a strictly monotone
  * `inCommitTimestamp` that is AUTHORITATIVE for timestamp time travel
  * — file mtime (lost by copies, skewed across writers) stops
  * mattering. Writer feature only; readers that ignore it still read
  * correctly. */
class DeltaIctSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("delta_ict_").toFile
    d.deleteOnExit(); d.getPath
  }

  private def ictOf(base: String, v: Long): Option[Long] = {
    val f = new java.io.File(base, f"_delta_log/$v%020d.json")
    Files.readAllLines(f.toPath).stream().findFirst().map[Option[Long]] { l =>
      val n = com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().readTree(l)
      Option(n.get("commitInfo"))
        .flatMap(ci => Option(ci.get("inCommitTimestamp")).map(_.asLong()))
    }.orElse(None)
  }

  test("enablement stamps the protocol + properties; later commits " +
       "carry strictly monotone ICTs even under a STALLED clock") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id"), base) // v0, no ICT
    assert(ictOf(base, 0L).isEmpty)
    DeltaInterop.withIctClock(() => 5000L) {
      DeltaInterop.enableInCommitTimestamps(spark, base) // v1
      DeltaInterop.append(spark.range(10, 12).toDF("id").coalesce(1), base)
      DeltaInterop.append(spark.range(12, 14).toDF("id").coalesce(1), base)
      DeltaDml.deleteVectoredWhere(spark, base, col("id") === 0L)
    }
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.minWriterVersion == 7)
    assert(snap.writerFeatureSet.contains("inCommitTimestamp"))
    assert(snap.configuration("delta.enableInCommitTimestamps") == "true")
    assert(snap.configuration("delta.inCommitTimestampEnablementVersion")
      == "1")
    val icts = (1L to 4L).map(v => ictOf(base, v).getOrElse(
      fail(s"commit $v of an ICT table lacks inCommitTimestamp")))
    // the clock returned 5000 for every commit — monotonicity must come
    // from the predecessor+1 rule, not from the clock
    assert(icts == icts.sorted && icts.distinct.size == icts.size,
      s"ICTs not strictly monotone: $icts")
    assert(DeltaInterop.read(spark, base).count() == 13)
  }

  test("timestamp time travel resolves by ICT, not file mtime") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(5).toDF("id"), base) // v0
    // ICTs FAR in the future relative to the files' real mtimes (the
    // enablement ICT clamps above the predecessor's mtime, keeping the
    // whole timestamp sequence monotone across the boundary) — a
    // reader still using mtime would resolve these queries wrongly
    DeltaInterop.withIctClock(() => 9000000000000L) {
      DeltaInterop.enableInCommitTimestamps(spark, base) // v1
    }
    DeltaInterop.withIctClock(() => 9100000000000L) {
      DeltaInterop.append(spark.range(5, 9).toDF("id").coalesce(1), base) // v2
    }
    DeltaInterop.withIctClock(() => 9200000000000L) {
      DeltaInterop.append(spark.range(9, 11).toDF("id").coalesce(1), base) // v3
    }
    assert(ictOf(base, 2L).contains(9100000000000L))
    val v1Ict = ictOf(base, 1L).get
    assert(DeltaInterop.versionAtTimestamp(base, v1Ict) == 1L)
    assert(DeltaInterop.versionAtTimestamp(base, 9150000000000L) == 2L)
    assert(DeltaInterop.versionAtTimestamp(base, 9200000000001L) == 3L)
    // a query between v3's MTIME (now) and v2's ICT resolves to v1 —
    // mtime no longer matters once ICTs exist
    assert(DeltaInterop.versionAtTimestamp(base, 9000000000001L) == 1L)
    // reading at the ICT boundary gives the v2 contents
    val got = DeltaInterop.read(spark, base,
      timestampAsOf = Some(9150000000000L))
    assert(got.count() == 9)
    // history reports the ICTs, not the (much later) mtimes
    val hist = DeltaInterop.history(spark, base)
      .orderBy("version").collect()
    assert(hist(2).getAs[java.sql.Timestamp]("timestamp").getTime == ictOf(base, 2L).get)
    assert(hist(0).getAs[java.sql.Timestamp]("timestamp").getTime ==
      new java.io.File(base, f"_delta_log/${0L}%020d.json").lastModified(),
      "pre-enablement commits keep the mtime clock")
  }

  test("SQL: SET TBLPROPERTIES routes ICT enablement as an UPGRADE") {
    import graft.pipeline.GraftSql
    val base = tmp()
    DeltaInterop.overwrite(spark.range(6).toDF("id"), base)
    GraftSql.registerDeltaTable(spark, "ict_t", base)
    DeltaInterop.withIctClock(() => 8000L) {
      GraftSql.sql(spark,
        "ALTER TABLE ict_t SET TBLPROPERTIES " +
        "('delta.enableInCommitTimestamps'='true')")
      GraftSql.sql(spark, "DELETE FROM ict_t WHERE id = 2")
    }
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.writerFeatureSet.contains("inCommitTimestamp"))
    assert(ictOf(base, 1L).isDefined && ictOf(base, 2L).isDefined)
    assert(ictOf(base, 2L).get > ictOf(base, 1L).get)
    assert(spark.table("ict_t").count() == 5)
    // disabling refuses
    intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ALTER TABLE ict_t SET TBLPROPERTIES " +
      "('delta.enableInCommitTimestamps'='false')"))
  }

  test("CDF reports _commit_timestamp from the ICT, not file mtime") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id"), base,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaInterop.withIctClock(() => 9000000000000L) {
      DeltaInterop.enableInCommitTimestamps(spark, base) // v1
      DeltaDml.updateWhere(spark, base, col("id") === 4L,
        Map("id" -> lit(400L))) // v2
    }
    val feed = DeltaDml.readChangeFeed(spark, base, 2L)
    val tsv = feed.select("_commit_timestamp").distinct()
      .collect().map(_.getTimestamp(0).getTime).toSeq
    assert(tsv.size == 1 && tsv.head == ictOf(base, 2L).get,
      s"CDF timestamps $tsv != ICT ${ictOf(base, 2L)}")
  }

  test("delta.checkpointPolicy=v2 routes checkpoint() to the " +
       "sidecar layout; replay stays value-exact") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(30).toDF("id"), base,
      configuration = Map("delta.checkpointPolicy" -> "v2"))
    DeltaInterop.append(spark.range(30, 40).toDF("id").coalesce(1), base)
    DeltaInterop.checkpoint(spark, base)
    val logDir = new java.io.File(base, "_delta_log")
    assert(logDir.listFiles().exists(f =>
      f.getName.matches("\\d{20}\\.checkpoint\\.[0-9a-f-]+\\.parquet")),
      "policy v2 must produce a UUID-named v2 checkpoint")
    assert(new java.io.File(logDir, "_sidecars").exists())
    DeltaInterop.append(spark.range(40, 45).toDF("id").coalesce(1), base)
    assert(DeltaInterop.read(spark, base).count() == 45)
    // unknown policy refuses
    val b2 = tmp()
    DeltaInterop.overwrite(spark.range(3).toDF("id"), b2,
      configuration = Map("delta.checkpointPolicy" -> "v3-nope"))
    intercept[IllegalArgumentException](DeltaInterop.checkpoint(spark, b2))
  }

  test("a FOREIGN table declaring inCommitTimestamp: our DML upholds " +
       "the contract (every commit stamps a monotone ICT)") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(20).toDF("id"), base)
    DeltaInterop.withIctClock(() => 7000L) {
      DeltaInterop.enableInCommitTimestamps(spark, base)
      // the whole DML family commits through writeCommit's probe
      DeltaDml.updateWhere(spark, base, col("id") === 3L,
        Map("id" -> lit(300L)))
      DeltaDml.mergeUpsert(spark, base,
        Seq(5L, 99L).toDF("id"), "id")
      DeltaInterop.checkpoint(spark, base)
      DeltaInterop.optimize(spark, base, smallFileBytes = 1L << 20)
    }
    val vs = (1L to DeltaInterop.snapshot(spark, base).version)
    val icts = vs.flatMap(v => ictOf(base, v))
    assert(icts.size == vs.size,
      s"some post-enablement commit lacks an ICT (${icts.size}/${vs.size})")
    assert(icts == icts.sorted && icts.distinct.size == icts.size)
    assert(DeltaInterop.read(spark, base).count() == 21)
  }
}
