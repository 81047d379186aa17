package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.pipeline.{GraftLog, GraftSql}

/** SQL DML front-end: MERGE INTO / DELETE FROM statements parsed by
  * Spark's parser, dispatched to graft-log's upsert/delete, equivalent
  * to the API path; non-DML and unregistered tables fall through. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_sql_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  test("DELETE FROM matches the API delete exactly; view follows the head") {
    val base = freshBase("del")
    GraftLog.overwriteClustered(
      (0L until 100L).map(k => (k, k % 7)).toDF("k", "g"), base,
      Seq("k"), nFiles = 4)
    GraftSql.registerTable(spark, "sql_del_t", base)
    val res = GraftSql.sql(spark,
      "DELETE FROM sql_del_t WHERE k >= 25 AND k <= 74")
    assert(res.select("operation").head().getString(0) == "DELETE")
    // the registered view reads the post-DML head
    assert(spark.sql("SELECT count(*) AS n FROM sql_del_t")
      .head().getLong(0) == 50L)
    assert(GraftLog.read(spark, base).count() == 50L)
  }

  test("DELETE honors SQL NULL semantics through the SQL surface") {
    val base = freshBase("delnull")
    GraftLog.overwriteClustered(
      Seq[(Long, java.lang.Long)]((1L, 10L), (2L, null), (3L, 30L))
        .toDF("k", "v"), base, Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "sql_delnull_t", base)
    GraftSql.sql(spark, "DELETE FROM sql_delnull_t WHERE v > 15")
    assert(GraftLog.read(spark, base).select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L)) // NULL predicate keeps the row
  }

  test("MERGE INTO upserts: matched rows update, new keys insert") {
    val base = freshBase("merge")
    GraftLog.overwriteClustered(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"), base,
      Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "sql_merge_t", base)
    Seq((2L, 22.0), (9L, 90.0)).toDF("k", "v")
      .createOrReplaceTempView("sql_merge_src")
    val res = GraftSql.sql(spark,
      """MERGE INTO sql_merge_t t USING sql_merge_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(res.select("operation").head().getString(0) == "MERGE")
    val got = GraftLog.read(spark, base).as[(Long, Double)]
      .collect().sorted.toSeq
    assert(got == Seq((1L, 10.0), (2L, 22.0), (3L, 30.0), (9L, 90.0)))
    // and via the refreshed SQL view
    assert(spark.sql("SELECT sum(v) AS s FROM sql_merge_t")
      .head().getDouble(0) == 10.0 + 22.0 + 30.0 + 90.0)
  }

  test("MERGE schema evolution: new source columns land behind the opt-in") {
    import graft.sources.{DeltaDml, DeltaInterop}
    val base = freshBase("merge_evolve")
    DeltaInterop.overwrite(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").coalesce(1), base)
    GraftSql.registerDeltaTable(spark, "sql_merge_ev", base)
    Seq((2L, 22.0, "eu"), (9L, 90.0, "us")).toDF("k", "v", "region")
      .createOrReplaceTempView("sql_merge_ev_src")
    val stmt =
      """MERGE INTO sql_merge_ev t USING sql_merge_ev_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *"""
    // without the opt-in the extra column refuses (a typo'd source
    // column must not silently widen the table)
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark, stmt))
    assert(e.getMessage.contains("exactly the table columns"))
    spark.conf.set("spark.graft.delta.autoMerge", "true")
    try {
      GraftSql.sql(spark, stmt)
      val got = spark.table("sql_merge_ev")
        .select("k", "v", "region").as[(Long, Double, Option[String])]
        .collect().sortBy(_._1).toSeq
      // evolved: merged rows carry values, untouched old rows read NULL
      assert(got == Seq((1L, 10.0, None), (2L, 22.0, Some("eu")),
        (9L, 90.0, Some("us"))))
      assert(DeltaInterop.snapshot(spark, base).schema.fieldNames.toSeq ==
        Seq("k", "v", "region"))
    } finally spark.conf.unset("spark.graft.delta.autoMerge")
    // the API flag composes the same way
    val base2 = freshBase("merge_evolve_api")
    DeltaInterop.overwrite(Seq((1L, 1.0)).toDF("k", "v").coalesce(1), base2)
    DeltaDml.mergeUpsertKeys(spark, base2,
      Seq((1L, 5.0, 7L)).toDF("k", "v", "w"), Seq("k"),
      evolveSchema = true)
    assert(DeltaInterop.read(spark, base2).select("k", "v", "w")
      .as[(Long, Double, Long)].collect().toSeq == Seq((1L, 5.0, 7L)))
  }

  test("MERGE with a subquery source works (Spark parses, we dispatch)") {
    val base = freshBase("mergesub")
    GraftLog.overwriteClustered(
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), base, Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "sql_msub_t", base)
    Seq((1L, 100.0), (5L, 500.0), (6L, 600.0)).toDF("k", "v")
      .createOrReplaceTempView("sql_msub_src")
    GraftSql.sql(spark,
      """MERGE INTO sql_msub_t t
         USING (SELECT k, v FROM sql_msub_src WHERE k < 6) s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(GraftLog.read(spark, base).as[(Long, Double)].collect().sorted
      .toSeq == Seq((1L, 100.0), (2L, 2.0), (5L, 500.0)))
  }

  test("unsupported merge shapes refuse with a clear message") {
    val base = freshBase("mergebad")
    GraftLog.overwriteClustered(Seq((1L, 1.0)).toDF("k", "v"), base,
      Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "sql_mbad_t", base)
    Seq((1L, 9.0)).toDF("k", "v").createOrReplaceTempView("sql_mbad_src")
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        """MERGE INTO sql_mbad_t t USING sql_mbad_src s ON t.k = s.k
           WHEN MATCHED THEN DELETE""")
    }
    assert(e.getMessage.contains("UPDATE SET *"))
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        """MERGE INTO sql_mbad_t t USING sql_mbad_src s ON t.k < s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(e2.getMessage.contains("conjunction of equalities"))
  }

  test("conditional MERGE: WHEN MATCHED AND <cond> gates the update") {
    import graft.sources.DeltaInterop
    val base = freshBase("merge_cond")
    DeltaInterop.overwrite(
      Seq((1L, 10.0), (2L, 200.0), (3L, 30.0)).toDF("k", "v").coalesce(1),
      base)
    GraftSql.registerDeltaTable(spark, "sql_mcond_t", base)
    Seq((1L, 100.0), (2L, 2.0), (7L, 70.0), (8L, -1.0)).toDF("k", "v")
      .createOrReplaceTempView("sql_mcond_src")
    // update only when the source value is HIGHER; insert only positives
    GraftSql.sql(spark,
      """MERGE INTO sql_mcond_t t USING sql_mcond_src s ON t.k = s.k
         WHEN MATCHED AND s.v > t.v THEN UPDATE SET *
         WHEN NOT MATCHED AND s.v > 0 THEN INSERT *""")
    val got = DeltaInterop.read(spark, base).as[(Long, Double)]
      .collect().sorted.toSeq
    // k=1 updated (100>10); k=2 NOT (2<200); k=3 untouched; k=7
    // inserted; k=8 filtered by the insert condition
    assert(got == Seq((1L, 100.0), (2L, 200.0), (3L, 30.0), (7L, 70.0)))
  }

  test("multi-column ON keys merge exactly on the composite key") {
    val base = freshBase("merge_multi")
    GraftLog.overwriteClustered(
      Seq((1L, "a", 1.0), (1L, "b", 2.0), (2L, "a", 3.0))
        .toDF("k1", "k2", "v"), base, Seq("k1"), nFiles = 1)
    GraftSql.registerTable(spark, "sql_mmulti_t", base)
    Seq((1L, "b", 20.0), (2L, "b", 40.0)).toDF("k1", "k2", "v")
      .createOrReplaceTempView("sql_mmulti_src")
    GraftSql.sql(spark,
      """MERGE INTO sql_mmulti_t t USING sql_mmulti_src s
         ON t.k1 = s.k1 AND t.k2 = s.k2
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val got = GraftLog.read(spark, base).as[(Long, String, Double)]
      .collect().sorted.toSeq
    // (1,b) updated by the composite match — a key1-only merge would
    // have clobbered (1,a) too; (2,b) inserted
    assert(got == Seq((1L, "a", 1.0), (1L, "b", 20.0), (2L, "a", 3.0),
      (2L, "b", 40.0)))
    // composite keys on the Delta path too
    import graft.sources.DeltaInterop
    val dbase = freshBase("merge_multi_d")
    DeltaInterop.overwrite(
      Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "v").coalesce(1),
      dbase)
    GraftSql.registerDeltaTable(spark, "sql_mmultid_t", dbase)
    GraftSql.sql(spark,
      """MERGE INTO sql_mmultid_t t USING sql_mmulti_src s
         ON t.k1 = s.k1 AND t.k2 = s.k2
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(DeltaInterop.read(spark, dbase).as[(Long, String, Double)]
      .collect().sorted.toSeq ==
      Seq((1L, "a", 1.0), (1L, "b", 20.0), (2L, "b", 40.0)))
  }

  test("Delta tables: DELETE FROM routes to DV delete, UPDATE to copy-on-write") {
    import graft.sources.DeltaInterop
    val base = freshBase("delta_sql")
    DeltaInterop.overwrite(
      (0L until 50L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1), base)
    GraftSql.registerDeltaTable(spark, "sql_delta_t", base)
    GraftSql.sql(spark, "UPDATE sql_delta_t SET v = v + 1000 WHERE k < 5")
    GraftSql.sql(spark, "DELETE FROM sql_delta_t WHERE k >= 45")
    // the refreshed view reads the post-DML state
    val got = spark.sql("SELECT sum(v) AS s, count(*) AS n FROM sql_delta_t")
      .as[(Double, Long)].head()
    val expect = (0 until 45).map(i => if (i < 5) i + 1000.0 else i.toDouble).sum
    assert(got == ((expect, 45L)))
    // merge-on-read: the delete landed as a deletion vector
    assert(DeltaInterop.snapshot(spark, base).files.exists(_.dv.isDefined))
    // MERGE routes to the stats-scoped Delta upsert
    Seq((1L, 9.0), (200L, 2000.0)).toDF("k", "v")
      .createOrReplaceTempView("sql_delta_src")
    GraftSql.sql(spark,
      """MERGE INTO sql_delta_t t USING sql_delta_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val after = spark.sql(
      "SELECT v FROM sql_delta_t WHERE k IN (1, 200) ORDER BY k")
      .as[Double].collect().toSeq
    assert(after == Seq(9.0, 2000.0)) // matched updated, unmatched inserted
    assert(spark.sql("SELECT count(*) AS n FROM sql_delta_t")
      .head().getLong(0) == 46L) // 45 survivors + 1 insert
  }

  test("INSERT INTO appends; INSERT OVERWRITE replaces (both formats)") {
    import graft.sources.DeltaInterop
    val base = freshBase("ins_log")
    GraftLog.overwriteClustered(Seq((1L, "a")).toDF("k", "s"), base,
      Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "sql_ins_t", base)
    Seq((2L, "b"), (3L, "c")).toDF("k", "s")
      .createOrReplaceTempView("sql_ins_src")
    GraftSql.sql(spark, "INSERT INTO sql_ins_t SELECT * FROM sql_ins_src")
    assert(spark.sql("SELECT count(*) AS n FROM sql_ins_t")
      .head().getLong(0) == 3L)
    GraftSql.sql(spark,
      "INSERT OVERWRITE sql_ins_t SELECT * FROM sql_ins_src WHERE k = 3")
    assert(GraftLog.read(spark, base).as[(Long, String)].collect().toSeq ==
      Seq((3L, "c")))
    // delta handler
    val dbase = freshBase("ins_delta")
    DeltaInterop.overwrite(Seq((1L, 1.0)).toDF("k", "v").coalesce(1), dbase)
    GraftSql.registerDeltaTable(spark, "sql_insd_t", dbase)
    Seq((9L, 9.0)).toDF("k", "v").createOrReplaceTempView("sql_insd_src")
    GraftSql.sql(spark, "INSERT INTO sql_insd_t SELECT * FROM sql_insd_src")
    assert(spark.sql("SELECT sum(v) AS s FROM sql_insd_t")
      .head().getDouble(0) == 10.0)
  }

  test("INSERT OVERWRITE preserves the Delta table definition") {
    import graft.sources.DeltaInterop
    val base = freshBase("ins_keep")
    DeltaInterop.overwrite(
      Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "part", "v").coalesce(1),
      base, partitionBy = Seq("part"),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val before = DeltaInterop.snapshot(spark, base)
    GraftSql.registerDeltaTable(spark, "sql_keep_t", base)
    Seq((9L, "z", 9.0)).toDF("k", "part", "v")
      .createOrReplaceTempView("sql_keep_src")
    GraftSql.sql(spark,
      "INSERT OVERWRITE sql_keep_t SELECT * FROM sql_keep_src")
    val after = DeltaInterop.snapshot(spark, base)
    // contents replaced; DEFINITION (partitioning, properties, identity)
    // carried forward — SQL INSERT OVERWRITE never redefines the table
    assert(spark.sql("SELECT k FROM sql_keep_t").as[Long].collect().toSeq
      == Seq(9L))
    assert(after.partitionColumns == Seq("part"),
      s"partitioning dropped: ${after.partitionColumns}")
    assert(after.configuration.get("delta.enableChangeDataFeed")
      .contains("true"), s"properties dropped: ${after.configuration}")
    assert(after.tableId == before.tableId && after.tableId.isDefined,
      s"table id changed: ${before.tableId} -> ${after.tableId}")
    // downstream CDF consumers keep working across the overwrite: the
    // new version's change rows are the inserts
    val cdf = graft.sources.DeltaDml.readChangeFeed(spark, base,
      after.version, Some(after.version))
    assert(cdf.select("_change_type").distinct().as[String].collect()
      .toSet.contains("insert"))
  }

  test("UPDATE rejects struct-path SET targets instead of rerouting them") {
    import graft.sources.DeltaInterop
    val base = freshBase("upd_struct")
    DeltaInterop.overwrite(Seq((1L, 5.0)).toDF("k", "v").coalesce(1), base)
    GraftSql.registerDeltaTable(spark, "sql_structt", base)
    // a.v would resolve-by-last-part to column v — must refuse instead
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "UPDATE sql_structt SET a.v = 1 WHERE k = 1")
    }
    assert(e.getMessage.contains("struct-field"))
    // but the table's own alias/name qualifier is fine
    GraftSql.sql(spark, "UPDATE sql_structt SET sql_structt.v = 7 WHERE k = 1")
    assert(spark.sql("SELECT v FROM sql_structt").as[Double].head() == 7.0)
  }

  test("Iceberg tables: DELETE/MERGE/INSERT route to the Iceberg DML") {
    import graft.sources.IcebergInterop
    val base = freshBase("ice_sql")
    IcebergInterop.overwrite(
      (0L until 30L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1), base)
    GraftSql.registerIcebergTable(spark, "sql_ice_t", base)
    GraftSql.sql(spark, "DELETE FROM sql_ice_t WHERE k >= 25")
    assert(spark.sql("SELECT count(*) AS n FROM sql_ice_t")
      .head().getLong(0) == 25L)
    // merge-on-read: the delete landed as position-delete files
    assert(IcebergInterop.snapshot(spark, base).deletes.nonEmpty)
    Seq((1L, 9.0), (200L, 2000.0)).toDF("k", "v")
      .createOrReplaceTempView("sql_ice_src")
    GraftSql.sql(spark,
      """MERGE INTO sql_ice_t t USING sql_ice_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT v FROM sql_ice_t WHERE k IN (1, 200) ORDER BY k")
      .as[Double].collect().toSeq == Seq(9.0, 2000.0))
    GraftSql.sql(spark,
      "INSERT INTO sql_ice_t SELECT CAST(500 AS BIGINT) AS k, " +
      "CAST(5.0 AS DOUBLE) AS v")
    assert(spark.sql("SELECT count(*) AS n FROM sql_ice_t")
      .head().getLong(0) == 27L) // 25 survivors + 1 merge insert + 1 insert
    // UPDATE routes to the copy-on-write Iceberg update
    GraftSql.sql(spark, "UPDATE sql_ice_t SET v = v + 0.5 WHERE k = 500")
    assert(spark.sql("SELECT v FROM sql_ice_t WHERE k = 500")
      .as[Double].head() == 5.5)
    GraftSql.sql(spark,
      "INSERT OVERWRITE sql_ice_t SELECT CAST(1 AS BIGINT) AS k, " +
      "CAST(k AS DOUBLE) AS v FROM sql_ice_src WHERE k = 200")
    assert(spark.sql("SELECT k, v FROM sql_ice_t").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 200.0)))
  }

  test("MERGE full sync (with NOT MATCHED BY SOURCE DELETE) = exactly the source") {
    import graft.sources.DeltaInterop
    val base = freshBase("merge_sync")
    DeltaInterop.overwrite(
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
        .toDF("k", "part", "v").coalesce(1), base,
      partitionBy = Seq("part"),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val before = DeltaInterop.snapshot(spark, base)
    GraftSql.registerDeltaTable(spark, "sql_sync_t", base)
    // source: k=2 updated, k=9 new, k=1/3 absent (→ deleted)
    Seq((2L, "a", 22.0), (9L, "b", 9.0)).toDF("k", "part", "v")
      .createOrReplaceTempView("sql_sync_src")
    GraftSql.sql(spark,
      """MERGE INTO sql_sync_t t USING sql_sync_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *
         WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(spark.sql("SELECT k, v FROM sql_sync_t ORDER BY k")
      .as[(Long, Double)].collect().toSeq == Seq((2L, 22.0), (9L, 9.0)))
    // one atomic commit; table definition preserved
    val after = DeltaInterop.snapshot(spark, base)
    assert(after.version == before.version + 1)
    assert(after.partitionColumns == Seq("part") &&
      after.tableId == before.tableId &&
      after.configuration.get("delta.enableChangeDataFeed").contains("true"))
    // conditional combinations refuse (no atomic lowering)
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        """MERGE INTO sql_sync_t t USING sql_sync_src s ON t.k = s.k
           WHEN MATCHED AND s.v > t.v THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    }
    assert(e.getMessage.contains("atomic"))
  }

  test("retention-only MERGE DV-deletes rows whose key left the source") {
    import graft.sources.DeltaInterop
    val base = freshBase("merge_keep")
    DeltaInterop.overwrite(
      (0L until 20L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1), base)
    GraftSql.registerDeltaTable(spark, "sql_keep2_t", base)
    // allowlist: multiples of 3 (a key-only source is enough)
    (0L until 20L by 3).map(Tuple1(_)).toDF("k")
      .createOrReplaceTempView("sql_keep2_src")
    GraftSql.sql(spark,
      """MERGE INTO sql_keep2_t t USING sql_keep2_src s ON t.k = s.k
         WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(spark.sql("SELECT k FROM sql_keep2_t ORDER BY k").as[Long]
      .collect().toSeq == (0L until 20L by 3))
    // merge-on-read: the retention landed as a deletion vector, no
    // data file was rewritten
    assert(DeltaInterop.snapshot(spark, base).files.exists(_.dv.isDefined))
  }

  test("INSERT refuses mismatched source columns instead of writing them") {
    import graft.sources.DeltaInterop
    val base = freshBase("ins_shape")
    DeltaInterop.overwrite(Seq((1L, 1.0)).toDF("k", "v").coalesce(1), base)
    GraftSql.registerDeltaTable(spark, "sql_shape_t", base)
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "INSERT INTO sql_shape_t SELECT 2 AS k, 2.0 AS wrong_name")
    }
    assert(e.getMessage.contains("table columns"))
    // matching names with narrower types implicitly cast (SQL INSERT)
    GraftSql.sql(spark, "INSERT INTO sql_shape_t SELECT 2 AS k, 2 AS v")
    assert(spark.sql("SELECT sum(v) AS s FROM sql_shape_t")
      .head().getDouble(0) == 3.0)
  }

  test("INSERT with a column list binds positionally, NULL-fills the rest") {
    import graft.sources.DeltaInterop
    val base = freshBase("ins_cols")
    DeltaInterop.overwrite(
      Seq((1L, 1.0, "a")).toDF("k", "v", "s").coalesce(1), base)
    GraftSql.registerDeltaTable(spark, "sql_cols_t", base)
    // named (s, k) in SELECT order — v unnamed → NULL
    GraftSql.sql(spark,
      "INSERT INTO sql_cols_t (s, k) SELECT 'b' AS x, 2 AS y")
    val got = spark.sql("SELECT k, v, s FROM sql_cols_t ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getString(2)))
    assert(got.toSeq == Seq((1L, Some(1.0), "a"), (2L, None, "b")))
    // refusals: unknown column, arity mismatch, duplicate name
    val unk = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "INSERT INTO sql_cols_t (nope) SELECT 1")
    }
    assert(unk.getMessage.contains("must be distinct table columns"))
    val arity = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "INSERT INTO sql_cols_t (k, v) SELECT 1")
    }
    assert(arity.getMessage.contains("names 2 columns"))
    // identity table: the id column may be OMITTED via the list and
    // gets assigned; naming it still refuses downstream
    val ibase = freshBase("ins_cols_id")
    DeltaInterop.overwriteIdentity(
      Seq((10.0, "x")).toDF("v", "s"), ibase, "id", 1L, 1L)
    GraftSql.registerDeltaTable(spark, "sql_cols_id_t", ibase)
    GraftSql.sql(spark,
      "INSERT INTO sql_cols_id_t (v, s) SELECT 20.0, 'y'")
    assert(spark.sql("SELECT count(DISTINCT id) AS n FROM sql_cols_id_t")
      .head().getLong(0) == 2L)
  }

  test("DELETE WHERE k IN (SELECT ...) lowers to the semi-join DV delete") {
    import graft.sources.{DeltaDml, DeltaInterop}
    val base = freshBase("del_sub")
    DeltaInterop.overwrite(
      (0L until 30L).map(k => (k, k % 3)).toDF("k", "g"), base)
    GraftSql.registerDeltaTable(spark, "sql_delsub_t", base)
    Seq(1L, 4L, 7L, 99L).toDF("kk").createOrReplaceTempView("sql_delsub_src")
    GraftSql.sql(spark,
      "DELETE FROM sql_delsub_t WHERE k IN (SELECT kk FROM sql_delsub_src)")
    assert(spark.table("sql_delsub_t").count() == 27L)
    // merge-on-read: deletion vectors, not a rewrite
    assert(DeltaInterop.snapshot(spark, base).files
      .exists(_.dv.exists(_.cardinality > 0)))
    // NOT IN deletes the complement; a NULL key refuses loudly
    GraftSql.sql(spark,
      "DELETE FROM sql_delsub_t WHERE k NOT IN " +
      "(SELECT kk FROM sql_delsub_src WHERE kk < 50)")
    // survivors: exactly the (still-live) IN-list of the second source
    assert(spark.table("sql_delsub_t").select("k").as[Long]
      .collect().sorted.toSeq == Seq.empty) // 1,4,7 already deleted
    val base2 = freshBase("del_sub_null")
    DeltaInterop.overwrite(Seq((1L, 0L)).toDF("k", "g"), base2)
    GraftSql.registerDeltaTable(spark, "sql_delsub_null_t", base2)
    Seq[java.lang.Long](2L, null).toDF("kk")
      .createOrReplaceTempView("sql_delsub_null_src")
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "DELETE FROM sql_delsub_null_t WHERE k NOT IN " +
        "(SELECT kk FROM sql_delsub_null_src)")
    }
    assert(e.getMessage.contains("NULL"))
    // SQL NOT IN three-valued logic, TARGET side: a NULL key compares
    // UNKNOWN and the row SURVIVES (a bare anti join would delete it)
    val base3 = freshBase("del_sub_tgt_null")
    DeltaInterop.overwrite(
      Seq[(java.lang.Long, Long)]((1L, 0L), (null, 0L), (3L, 0L))
        .toDF("k", "g"), base3)
    GraftSql.registerDeltaTable(spark, "sql_delsub_tgt_t", base3)
    GraftSql.sql(spark, "DELETE FROM sql_delsub_tgt_t WHERE k NOT IN " +
      "(SELECT kk FROM sql_delsub_src WHERE kk = 1)")
    assert(spark.table("sql_delsub_tgt_t").select("k")
      .collect().map(r => Option(r.get(0))).toSet ==
      Set(Some(1L), None)) // 3 deleted; NULL-keyed row kept
  }

  test("DELETE WHERE k [NOT] IN (SELECT ...) lowers on graft-log and Iceberg too") {
    import graft.sources.IcebergInterop
    Seq(1L, 4L, 7L, 99L).toDF("kk").createOrReplaceTempView("sql_delsub_src2")
    // graft-log: semi-join DV delete (merge-on-read, no data rewrite)
    val lb = freshBase("del_sub_log")
    GraftLog.overwriteClustered(
      (0L until 30L).map(k => (k, k % 3)).toDF("k", "g"), lb,
      Seq("k"), nFiles = 3)
    GraftSql.registerTable(spark, "sql_delsub_log", lb)
    val filesBefore = GraftLog.snapshot(lb).files.toSet
    GraftSql.sql(spark, "DELETE FROM sql_delsub_log WHERE k IN " +
      "(SELECT kk FROM sql_delsub_src2)")
    assert(spark.table("sql_delsub_log").count() == 27L)
    val snapL = GraftLog.snapshot(lb)
    assert(snapL.files.toSet == filesBefore, "DV delete must not rewrite")
    assert(snapL.dvFiles.nonEmpty)
    GraftSql.sql(spark, "DELETE FROM sql_delsub_log WHERE k NOT IN " +
      "(SELECT kk FROM sql_delsub_src2 WHERE kk < 50)")
    assert(spark.table("sql_delsub_log").count() == 0L) // 1,4,7 gone already
    // Iceberg: semi-join position delete (format-v2 merge-on-read)
    val ib = freshBase("del_sub_ice")
    IcebergInterop.overwrite(
      (0L until 30L).map(k => (k, k % 3)).toDF("k", "g").coalesce(2), ib)
    GraftSql.registerIcebergTable(spark, "sql_delsub_ice", ib)
    GraftSql.sql(spark, "DELETE FROM sql_delsub_ice WHERE k IN " +
      "(SELECT kk FROM sql_delsub_src2)")
    assert(spark.table("sql_delsub_ice").count() == 27L)
    assert(IcebergInterop.snapshot(spark, ib).deletes.nonEmpty,
      "position deletes expected, not a rewrite")
    GraftSql.sql(spark, "DELETE FROM sql_delsub_ice WHERE k NOT IN " +
      "(SELECT kk FROM sql_delsub_src2 WHERE kk < 50)")
    assert(spark.table("sql_delsub_ice").count() == 0L)
    // target-side NULL key survives a NOT IN on both formats
    val lb2 = freshBase("del_sub_log_null")
    GraftLog.overwrite(Seq[(java.lang.Long, Long)]((1L, 0L), (null, 0L),
      (3L, 0L)).toDF("k", "g"), lb2)
    GraftSql.registerTable(spark, "sql_delsub_log_n", lb2)
    GraftSql.sql(spark, "DELETE FROM sql_delsub_log_n WHERE k NOT IN " +
      "(SELECT kk FROM sql_delsub_src2 WHERE kk = 1)")
    assert(spark.table("sql_delsub_log_n").select("k")
      .collect().map(r => Option(r.get(0))).toSet == Set(Some(1L), None))
    // subquery-side NULL refuses loudly on non-Delta formats too
    Seq[java.lang.Long](2L, null).toDF("kk")
      .createOrReplaceTempView("sql_delsub_null_src2")
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "DELETE FROM sql_delsub_log_n WHERE k NOT IN " +
        "(SELECT kk FROM sql_delsub_null_src2)")
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("UPDATE WHERE k [NOT] IN (SELECT ...) lowers to a semi/anti-join census") {
    import graft.sources.{DeltaInterop, IcebergInterop}
    Seq(2L, 5L, 99L).toDF("kk").createOrReplaceTempView("sql_updsub_src")
    def rows = (0L until 10L).map(k => (k, k * 10.0, k % 2)).toDF("k", "v", "g")
    // Delta: IN + an extra scalar conjunct gates the update
    val db = freshBase("upd_sub_delta")
    DeltaInterop.overwrite(rows, db)
    GraftSql.registerDeltaTable(spark, "sql_updsub_d", db)
    GraftSql.sql(spark, "UPDATE sql_updsub_d SET v = v + 1000 WHERE k IN " +
      "(SELECT kk FROM sql_updsub_src) AND g = 1")
    assert(spark.table("sql_updsub_d").select("k", "v").as[(Long, Double)]
      .collect().toMap == rows.as[(Long, Double, Long)].collect()
      .map { case (k, v, g) =>
        k -> (if (Set(2L, 5L).contains(k) && g == 1) v + 1000 else v) }.toMap)
    // NOT IN: unmatched keys update; NULL target key stays untouched
    val db2 = freshBase("upd_sub_delta_null")
    DeltaInterop.overwrite(Seq[(java.lang.Long, Double)]((1L, 1.0),
      (null, 2.0), (5L, 5.0)).toDF("k", "v"), db2)
    GraftSql.registerDeltaTable(spark, "sql_updsub_dn", db2)
    GraftSql.sql(spark, "UPDATE sql_updsub_dn SET v = 0 WHERE k NOT IN " +
      "(SELECT kk FROM sql_updsub_src WHERE kk = 5)")
    assert(spark.table("sql_updsub_dn").select("v").as[Double]
      .collect().sorted.toSeq == Seq(0.0, 2.0, 5.0))
    // subquery NULL refuses with the DELETE contract's message
    Seq[java.lang.Long](2L, null).toDF("kk")
      .createOrReplaceTempView("sql_updsub_null_src")
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "UPDATE sql_updsub_dn SET v = 0 WHERE k NOT IN " +
        "(SELECT kk FROM sql_updsub_null_src)")
    }
    assert(e.getMessage.contains("NULL"))
    // graft-log and Iceberg take the same lowering
    val lb = freshBase("upd_sub_log")
    GraftLog.overwriteClustered(rows, lb, Seq("k"), nFiles = 2)
    GraftSql.registerTable(spark, "sql_updsub_l", lb)
    GraftSql.sql(spark, "UPDATE sql_updsub_l SET v = -1 WHERE k IN " +
      "(SELECT kk FROM sql_updsub_src)")
    assert(spark.table("sql_updsub_l").filter(col("v") === -1.0)
      .select("k").as[Long].collect().sorted.toSeq == Seq(2L, 5L))
    val ib = freshBase("upd_sub_ice")
    IcebergInterop.overwrite(rows.coalesce(1), ib)
    GraftSql.registerIcebergTable(spark, "sql_updsub_i", ib)
    GraftSql.sql(spark, "UPDATE sql_updsub_i SET v = -1 WHERE k IN " +
      "(SELECT kk FROM sql_updsub_src)")
    assert(spark.table("sql_updsub_i").filter(col("v") === -1.0)
      .select("k").as[Long].collect().sorted.toSeq == Seq(2L, 5L))
    // correlated EXISTS with a QUALIFIED outer reference lowers to the
    // same distributed semi-join mark (inner conjuncts stay
    // subquery-side)
    GraftSql.sql(spark, "UPDATE sql_updsub_l SET v = -2 WHERE EXISTS " +
      "(SELECT 1 FROM sql_updsub_src s " +
      "WHERE s.kk = sql_updsub_l.k AND s.kk < 5)")
    assert(spark.table("sql_updsub_l").filter(col("v") === -2.0)
      .select("k").as[Long].collect().toSeq == Seq(2L))
    // an UNQUALIFIED outer reference is ambiguous (it could name an
    // inner column) → refuses toward MERGE rather than guessing
    val u = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "UPDATE sql_updsub_l SET v = 0 WHERE EXISTS " +
        "(SELECT 1 FROM sql_updsub_src WHERE kk = k)")
    }
    assert(u.getMessage.contains("MERGE"))
    // a non-equality conjunct touching the target row is a real join
    // condition — refuses
    val u2 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "UPDATE sql_updsub_l SET v = 0 WHERE EXISTS " +
        "(SELECT 1 FROM sql_updsub_src s WHERE s.kk = sql_updsub_l.k " +
        "AND s.kk > sql_updsub_l.g)")
    }
    assert(u2.getMessage.contains("join condition"))
    // DELETE WHERE EXISTS takes the same lowering (semi-join DV delete)
    GraftSql.sql(spark, "DELETE FROM sql_updsub_l WHERE EXISTS " +
      "(SELECT 1 FROM sql_updsub_src s " +
      "WHERE s.kk = sql_updsub_l.k AND s.kk >= 5)")
    assert(spark.table("sql_updsub_l").select("k").as[Long]
      .collect().sorted.toSeq == (0L until 10L).filterNot(_ == 5L))
    // NOT EXISTS is the anti join PROPER, not NOT IN: the NULL-key row
    // has no match, so NOT EXISTS is TRUE and the row UPDATES — the
    // NOT IN statement above left it untouched (UNKNOWN)
    GraftSql.sql(spark, "UPDATE sql_updsub_dn SET v = -9 WHERE NOT EXISTS " +
      "(SELECT 1 FROM sql_updsub_src s WHERE s.kk = sql_updsub_dn.k)")
    assert(spark.table("sql_updsub_dn").select("v").as[Double]
      .collect().sorted.toSeq == Seq(-9.0, -9.0, 5.0))
    // and DELETE WHERE NOT EXISTS deletes every unmatched row
    GraftSql.sql(spark, "DELETE FROM sql_updsub_l WHERE NOT EXISTS " +
      "(SELECT 1 FROM sql_updsub_src s WHERE s.kk = sql_updsub_l.k)")
    assert(spark.table("sql_updsub_l").select("k").as[Long]
      .collect().toSeq == Seq(2L))
  }

  test("ALTER TABLE ADD COLUMNS evolves all three formats; old rows read NULL") {
    import graft.sources.{DeltaInterop, IcebergInterop}
    // graft-log
    val lbase = freshBase("alter_log")
    GraftLog.overwriteClustered(Seq((1L, 10.0)).toDF("k", "v"), lbase,
      Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "sql_alter_l", lbase)
    val res = GraftSql.sql(spark,
      "ALTER TABLE sql_alter_l ADD COLUMNS (tag STRING, score INT)")
    assert(res.select("operation").head().getString(0) == "ADD COLUMNS")
    GraftSql.sql(spark,
      "INSERT INTO sql_alter_l SELECT CAST(2 AS BIGINT) AS k, " +
      "2.0 AS v, 'b' AS tag, 7 AS score")
    assert(spark.sql(
      "SELECT k, v, tag, score FROM sql_alter_l ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)), Option(r.get(3)))).toSeq ==
      Seq((1L, 10.0, None, None), (2L, 2.0, Some("b"), Some(7))))
    // delta: metadata-only — the data file set is untouched
    val dbase = freshBase("alter_delta")
    DeltaInterop.overwrite(Seq((1L, 10.0)).toDF("k", "v").coalesce(1), dbase)
    val filesBefore = DeltaInterop.snapshot(spark, dbase).files.map(_.path)
    GraftSql.registerDeltaTable(spark, "sql_alter_d", dbase)
    GraftSql.sql(spark, "ALTER TABLE sql_alter_d ADD COLUMNS (tag STRING)")
    assert(DeltaInterop.snapshot(spark, dbase).files.map(_.path) ==
      filesBefore)
    GraftSql.sql(spark,
      "INSERT INTO sql_alter_d SELECT CAST(2 AS BIGINT) AS k, " +
      "2.0 AS v, 'd' AS tag")
    assert(spark.sql("SELECT tag FROM sql_alter_d ORDER BY k")
      .collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(None, Some("d")))
    // iceberg: new schema-id, old files project NULL through field ids
    val ibase = freshBase("alter_ice")
    IcebergInterop.overwrite(Seq((1L, 10.0)).toDF("k", "v").coalesce(1), ibase)
    GraftSql.registerIcebergTable(spark, "sql_alter_i", ibase)
    GraftSql.sql(spark, "ALTER TABLE sql_alter_i ADD COLUMNS (tag STRING)")
    GraftSql.sql(spark,
      "INSERT INTO sql_alter_i SELECT CAST(2 AS BIGINT) AS k, " +
      "2.0 AS v, 'i' AS tag")
    assert(spark.sql("SELECT tag FROM sql_alter_i ORDER BY k")
      .collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(None, Some("i")))
  }

  test("ALTER TABLE ADD COLUMNS refuses shapes that would lie") {
    val base = freshBase("alter_refuse")
    GraftLog.overwriteClustered(Seq((1L, 1.0)).toDF("k", "v"), base,
      Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "sql_alter_r", base)
    val notNull = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "ALTER TABLE sql_alter_r ADD COLUMNS (x INT NOT NULL)")
    }
    assert(notNull.getMessage.contains("NOT NULL"))
    val dup = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "ALTER TABLE sql_alter_r ADD COLUMNS (v DOUBLE)")
    }
    assert(dup.getMessage.contains("already exists"))
    val pos = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "ALTER TABLE sql_alter_r ADD COLUMNS (x INT FIRST)")
    }
    assert(pos.getMessage.contains("FIRST/AFTER"))
    // unregistered table falls through to Spark's own error
    intercept[Exception] {
      GraftSql.sql(spark,
        "ALTER TABLE not_registered_alter ADD COLUMNS (x INT)").collect()
    }
  }

  test("SELECT VERSION AS OF / TIMESTAMP AS OF time-travels registered tables") {
    import graft.sources.{DeltaInterop, IcebergInterop}
    // graft-log VERSION AS OF (v1 = the overwrite)
    val lbase = freshBase("tt_log")
    GraftLog.overwriteClustered(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"),
      lbase, Seq("k"), nFiles = 1)
    GraftLog.delete(spark, lbase, col("k") === 1L)
    GraftSql.registerTable(spark, "sql_tt_l", lbase)
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM sql_tt_l VERSION AS OF 1")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) AS n FROM sql_tt_l")
      .head().getLong(0) == 1L)
    // delta: join current against version 0 in ONE statement
    val dbase = freshBase("tt_delta")
    DeltaInterop.overwrite(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").coalesce(1), dbase)
    DeltaInterop.append(Seq((3L, 30.0)).toDF("k", "v").coalesce(1), dbase)
    GraftSql.registerDeltaTable(spark, "sql_tt_d", dbase)
    val joined = GraftSql.sql(spark,
      """SELECT cur.k FROM sql_tt_d cur
         LEFT ANTI JOIN sql_tt_d VERSION AS OF 0 old ON cur.k = old.k""")
    assert(joined.as[Long].collect().toSeq == Seq(3L))
    // iceberg TIMESTAMP AS OF via the recorded snapshot timestamps
    val ibase = freshBase("tt_ice")
    IcebergInterop.withClock(
      IcebergInterop.tickingClock(1700000000000L, 60000L)) {
      IcebergInterop.overwrite(Seq((1L, 1.0)).toDF("k", "v").coalesce(1), ibase)
      IcebergInterop.append(Seq((2L, 2.0)).toDF("k", "v").coalesce(1), ibase)
    }
    GraftSql.registerIcebergTable(spark, "sql_tt_i", ibase)
    val firstTs = IcebergInterop.snapshotTimestamps(ibase).map(_._2).min
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM sql_tt_i TIMESTAMP AS OF " +
      s"timestamp_millis(${firstTs}L)").head().getLong(0) == 1L)
    // iceberg VERSION AS OF = snapshot id
    val firstSnap = IcebergInterop.snapshotIds(ibase).min
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM sql_tt_i VERSION AS OF $firstSnap")
      .head().getLong(0) == 1L)
    // unregistered time travel falls back to Spark's own error
    intercept[Exception] {
      GraftSql.sql(spark,
        "SELECT * FROM not_registered_tt VERSION AS OF 1").collect()
    }
  }

  test("CREATE TABLE / CTAS create, register, and round-trip all formats") {
    import graft.sources.{DeltaInterop, IcebergInterop}
    // empty CREATE on graft-log: schema-only commit, INSERT then works
    val lbase = freshBase("create_log")
    val res = GraftSql.sql(spark,
      s"CREATE TABLE sql_cr_l (k BIGINT, v DOUBLE) USING graftlog " +
      s"LOCATION '$lbase'")
    assert(res.select("operation").head().getString(0) == "CREATE TABLE")
    assert(spark.sql("SELECT count(*) AS n FROM sql_cr_l")
      .head().getLong(0) == 0L)
    GraftSql.sql(spark,
      "INSERT INTO sql_cr_l SELECT CAST(1 AS BIGINT) AS k, 1.5 AS v")
    assert(GraftLog.read(spark, lbase).as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.5)))
    // CTAS on delta, partitioned, with properties
    val dbase = freshBase("create_delta")
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)).toDF("k", "part", "v")
      .createOrReplaceTempView("sql_ctas_src")
    GraftSql.sql(spark,
      s"""CREATE TABLE sql_cr_d USING delta PARTITIONED BY (part)
          TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')
          LOCATION '$dbase'
          AS SELECT * FROM sql_ctas_src""")
    val snap = DeltaInterop.snapshot(spark, dbase)
    assert(snap.partitionColumns == Seq("part"))
    assert(snap.configuration("delta.enableChangeDataFeed") == "true")
    assert(spark.sql("SELECT sum(v) AS s FROM sql_cr_d")
      .head().getDouble(0) == 6.0)
    // CTAS on iceberg
    val ibase = freshBase("create_ice")
    GraftSql.sql(spark,
      s"CREATE TABLE sql_cr_i USING iceberg LOCATION '$ibase' " +
      "AS SELECT * FROM sql_ctas_src")
    assert(IcebergInterop.read(spark, ibase).count() == 3)
    // CREATE over an existing table refuses; IF NOT EXISTS registers
    val dup = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CREATE TABLE sql_cr_l2 (k BIGINT) USING graftlog " +
        s"LOCATION '$lbase'")
    }
    assert(dup.getMessage.contains("already exists"))
    GraftSql.sql(spark,
      s"CREATE TABLE IF NOT EXISTS sql_cr_l2 (k BIGINT) USING graftlog " +
      s"LOCATION '$lbase'")
    assert(spark.sql("SELECT count(*) AS n FROM sql_cr_l2")
      .head().getLong(0) == 1L) // registered the EXISTING data, no wipe
    // LOCATION is required; USING parquet falls through to Spark
    val noLoc = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE TABLE sql_cr_x (k INT) USING graftlog")
    }
    assert(noLoc.getMessage.contains("LOCATION"))
  }

  test("CREATE OR REPLACE TABLE swaps the definition, keeps the history") {
    import graft.sources.DeltaInterop
    val base = freshBase("replace_delta")
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "v")
      .createOrReplaceTempView("sql_rep_src")
    GraftSql.sql(spark,
      s"CREATE TABLE sql_rep_t USING delta LOCATION '$base' " +
      "AS SELECT * FROM sql_rep_src")
    val id0 = DeltaInterop.snapshot(spark, base).tableId
    // REPLACE with a NEW definition: different schema + partitioning
    GraftSql.sql(spark,
      s"""CREATE OR REPLACE TABLE sql_rep_t USING delta
          PARTITIONED BY (part) LOCATION '$base'
          AS SELECT k * 10 AS k, part, v + 0.5 AS v FROM sql_rep_src""")
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.partitionColumns == Seq("part"))
    assert(snap.tableId == id0, "REPLACE must keep the table identity")
    assert(spark.sql("SELECT sum(k) AS s FROM sql_rep_t")
      .head().getLong(0) == 30L)
    // history continues: version 0 still time-travels
    assert(DeltaInterop.read(spark, base, versionAsOf = Some(0L))
      .agg(sum("k")).head().getLong(0) == 3L)
    // plain REPLACE on a missing table refuses; OR CREATE creates
    val missing = freshBase("replace_missing")
    val err = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"REPLACE TABLE sql_rep_x (k BIGINT) USING graftlog " +
        s"LOCATION '$missing'")
    }
    assert(err.getMessage.contains("CREATE OR REPLACE"))
    GraftSql.sql(spark,
      s"CREATE OR REPLACE TABLE sql_rep_x (k BIGINT) USING graftlog " +
      s"LOCATION '$missing'")
    assert(spark.sql("SELECT count(*) AS n FROM sql_rep_x")
      .head().getLong(0) == 0L)
  }

  test("TRUNCATE TABLE empties contents, keeps the definition; DROP unregisters") {
    import graft.sources.DeltaInterop
    val base = freshBase("trunc_delta")
    DeltaInterop.overwrite(
      Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "part", "v").coalesce(1),
      base, partitionBy = Seq("part"),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val before = DeltaInterop.snapshot(spark, base)
    GraftSql.registerDeltaTable(spark, "sql_trunc_t", base)
    GraftSql.sql(spark, "TRUNCATE TABLE sql_trunc_t")
    val after = DeltaInterop.snapshot(spark, base)
    assert(spark.sql("SELECT count(*) AS n FROM sql_trunc_t")
      .head().getLong(0) == 0L)
    assert(after.partitionColumns == before.partitionColumns)
    assert(after.configuration == before.configuration)
    assert(after.tableId == before.tableId)
    // schema survives: INSERT with the original shape still works
    GraftSql.sql(spark,
      "INSERT INTO sql_trunc_t SELECT CAST(9 AS BIGINT) AS k, " +
      "'z' AS part, 9.0 AS v")
    assert(spark.sql("SELECT k FROM sql_trunc_t").as[Long].head() == 9L)
    // DROP TABLE: name gone, files stay
    GraftSql.sql(spark, "DROP TABLE sql_trunc_t")
    intercept[Exception] {
      GraftSql.sql(spark, "DELETE FROM sql_trunc_t WHERE k = 9").collect()
    }
    assert(new File(base, "_delta_log").exists(), "DROP keeps the files")
    // PURGE deletes the directory
    val pbase = freshBase("drop_purge")
    GraftLog.overwriteClustered(Seq((1L, 1.0)).toDF("k", "v"), pbase,
      Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "sql_purge_t", pbase)
    GraftSql.sql(spark, "DROP TABLE sql_purge_t PURGE")
    assert(!new File(pbase).exists())
  }

  test("UPDATE on a graft-log table rewrites only touched files") {
    val base = freshBase("log_update")
    GraftLog.overwriteClustered(
      (0L until 100L).map(k => (k, k * 1.0)).toDF("k", "v"), base,
      Seq("k"), nFiles = 4)
    val filesBefore = GraftLog.snapshot(base).files.toSet
    GraftSql.registerTable(spark, "sql_upd_l", base)
    GraftSql.sql(spark,
      "UPDATE sql_upd_l SET v = v + 1000 WHERE k >= 10 AND k <= 19")
    val got = spark.sql(
      "SELECT sum(v) AS s FROM sql_upd_l").head().getDouble(0)
    assert(got == (0L until 100L).map(_.toDouble).sum + 10 * 1000)
    // zone-map scoping: the clustered layout puts k 10-19 in ONE file —
    // the other three survive byte-identical
    val after = GraftLog.snapshot(base).files.toSet
    assert((filesBefore & after).size == 3,
      s"expected 3 untouched files, got ${(filesBefore & after).size}")
    // NULL predicate rows don't match; deterministic-predicate guard
    intercept[IllegalArgumentException] {
      GraftLog.updateWhere(spark, base,
        org.apache.spark.sql.functions.rand() > 0.5,
        Map("v" -> lit(0.0)))
    }
  }

  test("ALTER TABLE RENAME TO moves the registration, not the files") {
    val base = freshBase("rename_to")
    GraftLog.overwriteClustered(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"),
      base, Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "rt_old", base)
    GraftSql.sql(spark, "ALTER TABLE rt_old RENAME TO rt_new")
    assert(spark.sql("SELECT count(*) AS n FROM rt_new")
      .head().getLong(0) == 2L)
    // old name gone (both registry and view); DML follows the new name
    intercept[Exception] {
      GraftSql.sql(spark, "SELECT count(*) FROM rt_old").collect()
    }
    GraftSql.sql(spark, "DELETE FROM rt_new WHERE k = 1")
    assert(GraftLog.read(spark, base).count() == 1, "same path, same table")
    // renaming ONTO an existing registration refuses
    GraftSql.registerTable(spark, "rt_other", base)
    val err = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "ALTER TABLE rt_new RENAME TO rt_other")
    }
    assert(err.getMessage.contains("already"))
  }

  test("non-DML statements and unregistered tables fall through to spark.sql") {
    val n = GraftSql.sql(spark, "SELECT 1 + 1 AS two").head().getInt(0)
    assert(n == 2)
    // DELETE on an unregistered table reaches Spark's own analyzer error
    intercept[Exception] {
      GraftSql.sql(spark, "DELETE FROM definitely_not_registered WHERE 1=1")
        .collect()
    }
  }
}
