package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.GraftSql
import graft.sources.{DeltaDml, DeltaInterop}

/** CHECK constraints end to end: ADD CONSTRAINT probes existing data,
  * records the condition + writer protocol, and every write path —
  * append, idempotent streaming append, INSERT, UPDATE, MERGE,
  * definition-preserving overwrite — validates its post-image before
  * staging. NULL conditions pass (SQL CHECK semantics). */
class DeltaConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("constraint_spec_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("ADD CONSTRAINT probes existing rows and raises the writer protocol") {
    val base = tmp()
    DeltaInterop.overwrite(Seq((1L, 10.0), (2L, 0.0)).toDF("k", "v"), base)
    // existing data violates → refuse, nothing recorded
    val err = intercept[IllegalArgumentException] {
      DeltaInterop.addCheckConstraint(spark, base, "vpos", "v > 0")
    }
    assert(err.getMessage.contains("existing data"))
    assert(DeltaInterop.snapshot(spark, base).configuration.isEmpty)
    DeltaInterop.addCheckConstraint(spark, base, "vnonneg", "v >= 0")
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.configuration("delta.constraints.vnonneg") == "v >= 0")
    assert(snap.minWriterVersion >= 3,
      "legacy writer version 3 implies checkConstraints")
    // duplicate name refuses
    intercept[IllegalArgumentException] {
      DeltaInterop.addCheckConstraint(spark, base, "vnonneg", "v >= 1")
    }
  }

  test("writes validate post-images; NULL passes; DROP lifts the gate") {
    val base = tmp()
    DeltaInterop.overwrite(
      Seq[(Long, java.lang.Double)]((1L, 10.0)).toDF("k", "v"), base)
    DeltaInterop.addCheckConstraint(spark, base, "vnonneg", "v >= 0")
    // violating append refuses before staging
    val v0 = DeltaInterop.snapshot(spark, base).version
    intercept[IllegalArgumentException] {
      DeltaInterop.append(
        Seq[(Long, java.lang.Double)]((2L, -1.0)).toDF("k", "v"), base)
    }
    assert(DeltaInterop.snapshot(spark, base).version == v0)
    // NULL condition passes (SQL CHECK: only FALSE violates)
    DeltaInterop.append(
      Seq[(Long, java.lang.Double)]((3L, null)).toDF("k", "v"), base)
    assert(DeltaInterop.read(spark, base).count() == 2)
    // idempotent (streaming) appends validate too
    intercept[IllegalArgumentException] {
      DeltaInterop.appendIdempotent(
        Seq[(Long, java.lang.Double)]((4L, -2.0)).toDF("k", "v"), base,
        appId = "cstr", txnVersion = 1L)
    }
    // merge validates the incoming rows
    intercept[IllegalArgumentException] {
      DeltaDml.mergeUpsert(spark, base,
        Seq[(Long, java.lang.Double)]((1L, -5.0)).toDF("k", "v"), "k")
    }
    DeltaDml.mergeUpsert(spark, base,
      Seq[(Long, java.lang.Double)]((1L, 5.0)).toDF("k", "v"), "k")
    assert(DeltaInterop.read(spark, base).where(col("k") === 1)
      .head().getDouble(1) == 5.0)
    // DROP CONSTRAINT lifts the gate
    DeltaInterop.dropCheckConstraint(spark, base, "vnonneg")
    DeltaInterop.append(
      Seq[(Long, java.lang.Double)]((9L, -9.0)).toDF("k", "v"), base)
    assert(DeltaInterop.read(spark, base).count() == 3)
    intercept[IllegalArgumentException] {
      DeltaInterop.dropCheckConstraint(spark, base, "ghost")
    }
    DeltaInterop.dropCheckConstraint(spark, base, "ghost", ifExists = true)
  }

  test("generated columns derive on write, validate when provided") {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val base = tmp()
    DeltaInterop.overwriteGenerated(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), base,
      Seq(("v_pct", DoubleType, "v / 100.0")))
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.minWriterVersion >= 4)
    assert(snap.schema("v_pct").metadata
      .getString("delta.generationExpression") == "v / 100.0")
    assert(DeltaInterop.read(spark, base).orderBy("k")
      .select("v_pct").as[Double].collect().toSeq == Seq(0.1, 0.2))
    // append WITHOUT the generated column: derived
    DeltaInterop.append(Seq((3L, 50.0)).toDF("k", "v"), base)
    assert(DeltaInterop.read(spark, base).where(col("k") === 3)
      .select("v_pct").as[Double].head() == 0.5)
    // append WITH a divergent value: refused before staging
    val v0 = DeltaInterop.snapshot(spark, base).version
    val err = intercept[IllegalArgumentException] {
      DeltaInterop.append(
        Seq((4L, 50.0, 99.0)).toDF("k", "v", "v_pct"), base)
    }
    assert(err.getMessage.contains("v_pct"))
    assert(DeltaInterop.snapshot(spark, base).version == v0)
    // a MATCHING provided value passes
    DeltaInterop.append(
      Seq((4L, 60.0, 0.6)).toDF("k", "v", "v_pct"), base)
    assert(DeltaInterop.read(spark, base).count() == 4)
    // UPDATE of a source column RECOMPUTES the generated one;
    // SET on the generated column itself refuses
    DeltaDml.updateWhere(spark, base, col("k") === 1,
      Map("v" -> lit(30.0)))
    assert(DeltaInterop.read(spark, base).where(col("k") === 1)
      .select("v_pct").as[Double].head() == 0.3)
    val e2 = intercept[IllegalArgumentException] {
      DeltaDml.updateWhere(spark, base, col("k") === 1,
        Map("v_pct" -> lit(9.9)))
    }
    assert(e2.getMessage.contains("GENERATED"))
    // MERGE derives the generated column for a bare source
    DeltaDml.mergeUpsert(spark, base,
      Seq((2L, 80.0), (9L, 90.0)).toDF("k", "v"), "k")
    val got = DeltaInterop.read(spark, base).orderBy("k")
      .select("k", "v_pct").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 0.3), (2L, 0.8), (3L, 0.5), (4L, 0.6), (9L, 0.9)))
    // SQL CREATE TABLE with GENERATED ALWAYS AS, then INSERT derives
    val sbase = tmp() + "/t"
    GraftSql.sql(spark,
      s"""CREATE TABLE gen_t (k BIGINT, v DOUBLE,
          v_pct DOUBLE GENERATED ALWAYS AS (v / 100.0))
          USING delta LOCATION '$sbase'""")
    GraftSql.sql(spark,
      "INSERT INTO gen_t SELECT CAST(1 AS BIGINT) AS k, 25.0 AS v")
    assert(spark.sql("SELECT v_pct FROM gen_t").as[Double].head() == 0.25)
  }

  test("identity columns assign contiguous unique ids across appends") {
    val base = tmp()
    DeltaInterop.overwriteIdentity(
      Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("s", "v"), base, "id",
      start = 100L, step = 10L)
    val snap0 = DeltaInterop.snapshot(spark, base)
    assert(snap0.minWriterVersion >= 6)
    assert(snap0.schema("id").metadata
      .getLong("delta.identity.highWaterMark") == 120L)
    val ids0 = DeltaInterop.read(spark, base)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids0 == Seq(100L, 110L, 120L))
    // append WITHOUT the column: continues from the mark, mark moves
    DeltaInterop.append(Seq(("d", 4.0), ("e", 5.0)).toDF("s", "v"), base)
    val all = DeltaInterop.read(spark, base)
      .select("id").as[Long].collect().sorted.toSeq
    assert(all == Seq(100L, 110L, 120L, 130L, 140L))
    assert(DeltaInterop.snapshot(spark, base).schema("id").metadata
      .getLong("delta.identity.highWaterMark") == 140L)
    // GENERATED ALWAYS: a provided id refuses
    val err = intercept[IllegalArgumentException] {
      DeltaInterop.append(
        Seq((999L, "x", 9.0)).toDF("id", "s", "v"), base)
    }
    assert(err.getMessage.contains("IDENTITY"))
    // UPDATE of other columns keeps ids; SET on the id refuses
    DeltaDml.updateWhere(spark, base, col("s") === "a",
      Map("v" -> lit(11.0)))
    assert(DeltaInterop.read(spark, base)
      .select("id").as[Long].collect().sorted.toSeq == all)
    intercept[IllegalArgumentException] {
      DeltaDml.updateWhere(spark, base, col("s") === "a",
        Map("id" -> lit(7L)))
    }
    // MERGE refuses on identity tables
    intercept[IllegalArgumentException] {
      DeltaDml.mergeUpsert(spark, base,
        Seq(("a", 1.5)).toDF("s", "v"), "s")
    }
    // determinism: same content → same id SET on a fresh table
    val base2 = tmp()
    DeltaInterop.overwriteIdentity(
      Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("s", "v"), base2, "id",
      start = 100L, step = 10L)
    val byS = DeltaInterop.read(spark, base)
      .where(col("id") <= 120).select("s", "id")
      .as[(String, Long)].collect().toMap
    val byS2 = DeltaInterop.read(spark, base2).select("s", "id")
      .as[(String, Long)].collect().toMap
    assert(byS2("a") == byS("a") && byS2("b") == byS("b"))
  }

  test("SQL: CREATE with IDENTITY, INSERT omits it, TRUNCATE keeps the mark") {
    val base = tmp() + "/t"
    GraftSql.sql(spark,
      s"""CREATE TABLE id_t (id BIGINT GENERATED ALWAYS AS IDENTITY
          (START WITH 1 INCREMENT BY 1), s STRING)
          USING delta LOCATION '$base'""")
    GraftSql.sql(spark,
      "INSERT INTO id_t SELECT 'x' AS s UNION ALL SELECT 'y' AS s")
    assert(spark.sql("SELECT id FROM id_t ORDER BY id").as[Long]
      .collect().toSeq == Seq(1L, 2L))
    // TRUNCATE preserves the identity definition AND the mark: a later
    // insert continues the sequence, never reuses ids
    GraftSql.sql(spark, "TRUNCATE TABLE id_t")
    GraftSql.sql(spark, "INSERT INTO id_t SELECT 'z' AS s")
    assert(spark.sql("SELECT id FROM id_t").as[Long].collect().toSeq ==
      Seq(3L))
    // INSERT OVERWRITE refuses; BY DEFAULT refuses at create
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "INSERT OVERWRITE id_t SELECT 'w' AS s")
    }
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""CREATE TABLE id_t2 (id BIGINT GENERATED BY DEFAULT AS
            IDENTITY, s STRING) USING delta LOCATION '${tmp()}/t2'""")
    }
  }

  test("SQL: ADD CONSTRAINT / DROP CONSTRAINT; INSERT validates") {
    val base = tmp()
    DeltaInterop.overwrite(Seq((1L, 10.0)).toDF("k", "v"), base)
    GraftSql.registerDeltaTable(spark, "cstr_t", base)
    GraftSql.sql(spark,
      "ALTER TABLE cstr_t ADD CONSTRAINT vcap CHECK (v <= 100)")
    val err = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "INSERT INTO cstr_t SELECT CAST(2 AS BIGINT) AS k, 500.0 AS v")
    }
    assert(err.getMessage.contains("vcap"))
    GraftSql.sql(spark,
      "INSERT INTO cstr_t SELECT CAST(2 AS BIGINT) AS k, 50.0 AS v")
    assert(spark.sql("SELECT count(*) AS n FROM cstr_t")
      .head().getLong(0) == 2L)
    // UPDATE through SQL validates the post-image
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "UPDATE cstr_t SET v = 1000 WHERE k = 1")
    }
    GraftSql.sql(spark, "ALTER TABLE cstr_t DROP CONSTRAINT vcap")
    GraftSql.sql(spark, "UPDATE cstr_t SET v = 1000 WHERE k = 1")
    assert(spark.sql("SELECT max(v) AS m FROM cstr_t")
      .head().getDouble(0) == 1000.0)
    // non-Delta tables refuse; non-CHECK constraints refuse
    val lbase = tmp()
    graft.pipeline.GraftLog.overwriteClustered(
      Seq((1L, 1.0)).toDF("k", "v"), lbase, Seq("k"), nFiles = 1)
    GraftSql.registerTable(spark, "cstr_l", lbase)
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "ALTER TABLE cstr_l ADD CONSTRAINT c CHECK (v > 0)")
    }
    intercept[Exception] {
      GraftSql.sql(spark,
        "ALTER TABLE cstr_t ADD CONSTRAINT pk PRIMARY KEY (k)")
    }
  }
}
