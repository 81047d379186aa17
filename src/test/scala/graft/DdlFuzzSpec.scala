package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.GraftLog
import graft.sources.{DeltaDml, DeltaInterop, IcebergInterop}

/** Randomized DDL/DML sequence fuzz: the SAME seeded operation
  * sequence (insert / add column / rename column / drop column /
  * delete-where / subquery delete / subquery update / maintenance /
  * restore) runs against all three formats AND a driver-side
  * model; final tables must match the model AND each other exactly.
  * This is the adversarial check for the evolution frontier — each
  * format takes a different mechanism (Delta column mapping, Iceberg
  * field ids, graft-log copy-on-write rewrites), and any divergence in
  * NULL-fill, resurrection-after-re-add, rename binding, or delete
  * masking shows up as a row diff here without hand-writing the case. */
class DdlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("ddl_fuzz_").toFile
    d.deleteOnExit(); d.getPath
  }

  /** Driver-side model: rows are (k → value-per-live-column); a row
    * lacking a column (inserted before its ADD) reads NULL. */
  private final case class Model(var cols: Vector[String],
                                 var rows: Vector[Map[String, Any]])

  private def runSequence(seed: Int, nOps: Int,
                          icebergV3: Boolean = false,
                          withDefaults: Boolean = false,
                          withPromotion: Boolean = false,
                          withIct: Boolean = false,
                          withUniform: Boolean = false,
                          withMirror: Boolean = false,
                          withClustering: Boolean = false,
                          withNdvStats: Boolean = false,
                          withWriteLayout: Boolean = false): Unit = {
    require(!withDefaults || icebergV3,
      "column defaults are a v3 capability")
    val rnd = new scala.util.Random(seed)
    // adversarial: no read may have primed session confs — the first
    // operation of a fresh session must stand on its own (the exact
    // condition that exposed the assembleRead field-id bug)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "false")
    val dbase = tmp(); val ibase = tmp(); val lbase = tmp()
    var nextKey = 0L
    var nameCounter = 0
    def freshCol(): String = { nameCounter += 1; s"c$nameCounter" }
    val c0 = freshCol()
    // the PROMOTION dimension: one extra INT column that a mid-sequence
    // op may widen to long on ALL three formats at once (Iceberg
    // metadata promotion, Delta typeWidening, graft-log copy-on-write)
    var intCol: Option[String] = if (withPromotion) Some("p0") else None
    var intPromoted = false
    val model = Model(Vector(c0) ++ intCol, Vector.empty)

    // RESTORE targets: (delta version, iceberg snapshot id, graft-log
    // version, model rows at that point). Only points with the CURRENT
    // schema are kept (cleared on schema ops — Iceberg's rollback
    // deliberately does NOT restore schema while Delta/graft-log do,
    // so cross-schema restores would legitimately diverge) and only
    // points whose files maintenance hasn't reclaimed (cleared on
    // vacuum/expire).
    val restorePoints = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Vector[Map[String, Any]])]
    def recordRestorePoint(): Unit = restorePoints +=
      ((DeltaInterop.snapshot(spark, dbase).version,
        IcebergInterop.resolveRef(ibase, "main"),
        GraftLog.snapshot(lbase).version,
        model.rows))


    def insertFrame(n: Int): (DataFrame, Seq[Map[String, Any]]) = {
      def valueOf(c: String, k: Long): Any =
        if (intCol.contains(c)) {
          val v = k * 7 + 3
          if (intPromoted) v else v.toInt
        } else (k * 31 + c.drop(1).toLong) * 0.5
      val rows = (0 until n).map { _ =>
        val k = nextKey; nextKey += 1
        Map[String, Any]("k" -> k) ++ model.cols.map(c => c -> valueOf(c, k))
      }
      val schema = StructType(StructField("k", LongType) +:
        model.cols.map(c => StructField(c,
          if (intCol.contains(c))
            (if (intPromoted) LongType else IntegerType)
          else DoubleType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(m =>
          Row.fromSeq("k" +: model.cols map (c => m(c)))), 1), schema)
      (df, rows)
    }

    // create all three with the initial column
    locally {
      val (df, rows) = insertFrame(5)
      DeltaInterop.overwrite(df, dbase)
      DeltaInterop.enableColumnMapping(spark, dbase) // rename/drop need it
      // the UNIFORM dimension: the Delta leg carries an Iceberg mirror
      // that must equal the table after EVERY op — the MAPPED table's
      // mirror binds Iceberg field ids to the mapping ids, so the full
      // op mix (rename/drop/promotion included) mirrors
      if (withUniform) graft.sources.Uniform.enable(spark, dbase)
      IcebergInterop.overwrite(df.coalesce(1), ibase,
        formatVersion = if (icebergV3) 3 else 2)
      GraftLog.overwrite(df, lbase)
      // the ICT dimension: from here every Delta commit in the
      // sequence — DML, evolution, maintenance, restore — must stamp a
      // strictly monotone in-commit timestamp (asserted at the end)
      if (withIct) DeltaInterop.enableInCommitTimestamps(spark, dbase)
      // the MIRROR dimension: the Iceberg leg carries a read-only
      // Delta log that must equal the table after EVERY op — including
      // rename/drop (the mirror upgrades itself to id-mapping and
      // resolves old files by Iceberg field id) and type promotion
      if (withMirror) graft.sources.DeltaMirror.enable(spark, ibase)
      // the CLUSTERING dimension: the Delta leg is liquid-clustered on
      // k from the start — every OPTIMIZE in the sequence is an
      // incremental LSM-cube pass, value-preserving by contract
      if (withClustering) DeltaInterop.enableClustering(spark, dbase, Seq("k"))
      // the NDV-STATS dimension: the Iceberg leg carries a theta
      // statistics file from the start — compaction must refresh it,
      // expire must keep-or-drop it coherently, and the final estimate
      // must be exact for the surviving keys
      if (withNdvStats) IcebergInterop.computeNdvStats(spark, ibase, Seq("k"))
      // the WRITE-LAYOUT dimension: the Iceberg leg carries a sort
      // order + range distribution from the start (every later data
      // staging range-clusters and stamps sort_order_id), and the
      // Delta leg opts into optimizedWrite + autoCompact with a tiny
      // minNumFiles — ordinary inserts interleave best-effort OPTIMIZE
      // commits mid-sequence, all value-preserving by contract
      if (withWriteLayout) {
        IcebergInterop.setSortOrder(ibase, Seq("k" -> true))
        IcebergInterop.setTableProperties(ibase,
          Map("write.distribution-mode" -> "range"))
        DeltaInterop.setProperties(spark, dbase, Map(
          "delta.autoOptimize.optimizeWrite" -> "true",
          "delta.autoOptimize.autoCompact" -> "true"))
        spark.conf.set("spark.databricks.delta.autoCompact.minNumFiles", 3)
      }
      model.rows = rows.toVector
      recordRestorePoint()
    }

    (1 to nOps).foreach { opIdx =>
      rnd.nextInt(10) match {
        case 8 => // SUBQUERY DELETE: k [NOT] IN (key frame)
          val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
          val negated = rnd.nextBoolean()
          val keys = model.rows.map(_("k").asInstanceOf[Long])
            .filter(_ % m == r) ++ Seq(nextKey + 1000, nextKey + 2000)
          val src = keys.toDF("k")
          if (negated) {
            DeltaDml.deleteVectoredNotInSource(spark, dbase, src, Seq("k"),
              keepNullKeys = true)
            IcebergInterop.deletePositionsNotInSource(spark, ibase, src, "k",
              keepNullKeys = true)
            GraftLog.deleteVectoredNotInSource(spark, lbase, src, "k",
              keepNullKeys = true)
            model.rows = model.rows.filter(row =>
              keys.contains(row("k").asInstanceOf[Long]))
          } else {
            DeltaDml.deleteVectoredInSource(spark, dbase, src, Seq("k"))
            IcebergInterop.deletePositionsInSource(spark, ibase, src, "k")
            GraftLog.deleteVectoredInSource(spark, lbase, src, "k")
            model.rows = model.rows.filterNot(row =>
              keys.contains(row("k").asInstanceOf[Long]))
          }
          recordRestorePoint()
        case 9 if model.cols.exists(!intCol.contains(_)) =>
          // SUBQUERY UPDATE: SET c += d WHERE k IN (keys) AND gate
          // (double columns only — += on the int column would silently
          // change its type)
          val doubles = model.cols.filterNot(intCol.contains)
          val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
          val m2 = 2 + rnd.nextInt(3); val r2 = rnd.nextInt(m2)
          val c = doubles(rnd.nextInt(doubles.size))
          val d = (1 + rnd.nextInt(9)).toDouble
          val keys = model.rows.map(_("k").asInstanceOf[Long])
            .filter(_ % m == r) ++ Seq(nextKey + 3000)
          val src = keys.toDF("k")
          val extra = Some(col("k") % m2 === r2)
          val set: Map[String, org.apache.spark.sql.Column] =
            Map(c -> (col(c) + lit(d)))
          DeltaDml.updateInSource(spark, dbase, src, "k", set,
            negated = false, extra = extra)
          IcebergInterop.updateInSource(spark, ibase, src, "k", set,
            negated = false, extra = extra)
          GraftLog.updateInSource(spark, lbase, src, "k", set,
            negated = false, extra = extra)
          def bump2(v: Any): Any = v match {
            case x: java.lang.Double => Double.box(x + d)
            case null => null
          }
          model.rows = model.rows.map { row =>
            val k = row("k").asInstanceOf[Long]
            if (keys.contains(k) && k % m2 == r2)
              row + (c -> bump2(row.getOrElse(c, null)))
            else row
          }
          recordRestorePoint()
        case 0 => // INSERT a batch under the current schema
          val (df, rows) = insertFrame(1 + rnd.nextInt(4))
          DeltaInterop.append(df, dbase)
          IcebergInterop.append(df.coalesce(1), ibase)
          GraftLog.append(df, lbase)
          model.rows ++= rows
          recordRestorePoint()
        case 1 => // ADD COLUMN (metadata-only everywhere)
          val c = freshCol()
          val st = StructType(Seq(StructField(c, DoubleType)))
          if (withDefaults && rnd.nextBoolean()) {
            // the DEFAULTS dimension: Iceberg fills pre-add rows via v3
            // initial-default METADATA alone; Delta/graft-log (no
            // retroactive defaults in their protocols) take the
            // equivalent explicit backfill UPDATE. All three must then
            // agree through every later op — a fill leaking onto
            // post-add rows, dying in compaction/rename/restore, or
            // missing a pre-add file diverges here.
            val d0 = (1 + rnd.nextInt(9)) * 0.25
            IcebergInterop.addColumn(ibase, c, DoubleType,
              default = Some(d0))
            DeltaInterop.addColumns(spark, dbase, st)
            DeltaDml.updateWhere(spark, dbase, col(c).isNull,
              Map(c -> lit(d0)))
            GraftLog.addColumns(lbase, st)
            GraftLog.updateWhere(spark, lbase, col(c).isNull,
              Map(c -> lit(d0)))
            model.cols :+= c
            model.rows = model.rows.map(_ + (c -> Double.box(d0)))
          } else {
            DeltaInterop.addColumns(spark, dbase, st)
            IcebergInterop.addColumn(ibase, c, DoubleType)
            GraftLog.addColumns(lbase, st)
            model.cols :+= c // existing rows lack it → NULL
          }
          restorePoints.clear() // schema moved — old points unrestorable
        case 2 if model.cols.size >= 1 => // RENAME a non-key column
          val from = model.cols(rnd.nextInt(model.cols.size))
          val to = freshCol()
          DeltaInterop.renameColumn(spark, dbase, from, to)
          IcebergInterop.renameColumn(ibase, from, to)
          GraftLog.renameColumnRewrite(spark, lbase, from, to)
          if (intCol.contains(from)) intCol = Some(to)
          model.cols = model.cols.map(c => if (c == from) to else c)
          model.rows = model.rows.map(r =>
            if (r.contains(from)) r - from + (to -> r(from)) else r)
          restorePoints.clear()
        case 3 if model.cols.size >= 2 => // DROP a non-key column
          val c = model.cols(rnd.nextInt(model.cols.size))
          DeltaInterop.dropColumns(spark, dbase, Seq(c))
          IcebergInterop.dropColumn(spark, ibase, c)
          GraftLog.dropColumnsRewrite(spark, lbase, Seq(c))
          if (intCol.contains(c)) intCol = None
          model.cols = model.cols.filterNot(_ == c)
          model.rows = model.rows.map(_ - c)
          restorePoints.clear()
        case 4 => // DELETE WHERE k % m = r
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val pred = col("k") % m === r
          DeltaDml.deleteVectoredWhere(spark, dbase, pred)
          IcebergInterop.deletePositionsWhere(spark, ibase, pred)
          GraftLog.delete(spark, lbase, pred)
          model.rows = model.rows.filterNot(row =>
            row("k").asInstanceOf[Long] % m == r)
          recordRestorePoint()
        case 6 => // MAINTENANCE — value-preserving by contract, so the
          // model does NOT move; any drift is a maintenance bug
          rnd.nextInt(if (withClustering) 5 else 4) match {
            case 0 => DeltaInterop.checkpoint(spark, dbase)
            case 1 => DeltaInterop.optimize(spark, dbase,
              smallFileBytes = 1L << 20)
            case 2 => DeltaInterop.vacuum(spark, dbase, retainMillis = 0L)
            case 3 => DeltaInterop.reorgPurge(spark, dbase)
            case 4 => // CLUSTER BY NONE round trip (metadata-only both ways)
              DeltaInterop.disableClustering(spark, dbase)
              DeltaInterop.enableClustering(spark, dbase, Seq("k"))
          }
          rnd.nextInt(4) match {
            case 0 => IcebergInterop.rewriteDataFiles(spark, ibase,
              smallFileBytes = 1L << 20)
            case 1 => IcebergInterop.rewriteManifests(spark, ibase)
            case 2 => IcebergInterop.expireSnapshots(spark, ibase)
            case 3 => IcebergInterop.rewriteDataFilesSorted(spark, ibase,
              Seq("k"), filesPerPartition = 2)
          }
          rnd.nextInt(2) match {
            case 0 => GraftLog.compact(spark, lbase,
              targetRowsPerFile = 1000L)
            case 1 => GraftLog.vacuum(lbase, keepVersions = 1,
              retentionMs = 0L)
          }
          restorePoints.clear() // vacuum/expire may have reclaimed them
        case 7 if restorePoints.nonEmpty =>
          // RESTORE to a recorded point: all three formats must land on
          // the SAME earlier contents (Delta metadata restore, Iceberg
          // snapshot rollback, graft-log add/remove restore commit) and
          // the model simply rewinds its rows
          val (dv, isid, lv, rows) =
            restorePoints(rnd.nextInt(restorePoints.size))
          DeltaInterop.restore(spark, dbase, dv)
          IcebergInterop.rollbackTo(ibase, isid)
          GraftLog.restore(spark, lbase, lv)
          model.rows = rows
          recordRestorePoint() // the restored state is again a point
        case 5 if withPromotion && intCol.isDefined && !intPromoted =>
          // PROMOTE the int column to long on ALL three formats in one
          // step: Iceberg O(1) metadata, Delta typeWidening feature
          // commit, graft-log honest cast rewrite — then every later op
          // (DML, rename, drop, maintenance, restore) composes on top
          val c = intCol.get
          DeltaInterop.widenColumnType(spark, dbase, c, LongType)
          IcebergInterop.promoteColumnType(ibase, c, LongType)
          GraftLog.promoteColumnRewrite(spark, lbase, c, LongType)
          intPromoted = true
          model.rows = model.rows.map { r =>
            r.get(c) match {
              case Some(i: java.lang.Integer) => r + (c -> Long.box(i.toLong))
              case _ => r
            }
          }
          restorePoints.clear() // schema moved — old points unrestorable
        case _ => // UPDATE SET c = c + d WHERE k % m = r (doubles only:
          // += on the int column would silently change its type)
          val doubles = model.cols.filterNot(intCol.contains)
          if (doubles.nonEmpty) {
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            val c = doubles(rnd.nextInt(doubles.size))
            val d = (1 + rnd.nextInt(9)).toDouble
            val pred = col("k") % m === r
            def bump(v: Any): Any = v match {
              case x: java.lang.Double => Double.box(x + d)
              case null => null // SQL: NULL + d stays NULL
            }
            DeltaDml.updateWhere(spark, dbase, pred,
              Map(c -> (col(c) + lit(d))))
            IcebergInterop.updateWhere(spark, ibase, pred,
              Map(c -> (col(c) + lit(d))))
            GraftLog.updateWhere(spark, lbase, pred,
              Map(c -> (col(c) + lit(d))))
            model.rows = model.rows.map(row =>
              if (row("k").asInstanceOf[Long] % m == r)
                row + (c -> bump(row.getOrElse(c, null)))
              else row)
            recordRestorePoint()
          }
      }
      if (withUniform) {
        // the mirror must equal the Delta table after EVERY op —
        // catch-up sync then value-exact compare through the Iceberg
        // reader at the same base
        graft.sources.Uniform.sync(spark, dbase)
        val want = ("k" +: model.cols).map(col)
        val dRows = DeltaInterop.read(spark, dbase)
          .select(want: _*).orderBy("k").collect().toSeq
        val mRows = IcebergInterop.read(spark, dbase)
          .select(want: _*).orderBy("k").collect().toSeq
        assert(mRows == dRows,
          s"seed=$seed op=$opIdx: the uniform mirror diverged from Delta")
      }
      if (withMirror) {
        // symmetric: the Delta mirror must equal the Iceberg leg
        graft.sources.DeltaMirror.sync(spark, ibase)
        val want = ("k" +: model.cols).map(col)
        val iRows = IcebergInterop.read(spark, ibase)
          .select(want: _*).orderBy("k").collect().toSeq
        val mRows = DeltaInterop.read(spark, ibase)
          .select(want: _*).orderBy("k").collect().toSeq
        assert(mRows == iRows,
          s"seed=$seed op=$opIdx: the Delta mirror diverged from Iceberg")
      }
    }

    // final comparison: every format vs the model, column by column
    def normalized(df: DataFrame): Seq[Seq[Any]] = {
      assert(df.columns.toSeq == ("k" +: model.cols),
        s"schema diverged: ${df.columns.toSeq} vs ${"k" +: model.cols}")
      df.orderBy("k").collect().map(_.toSeq).toSeq
    }
    val expected = model.rows.sortBy(_("k").asInstanceOf[Long]).map(r =>
      r("k") +: model.cols.map(c => r.getOrElse(c, null)))
    Seq("delta" -> DeltaInterop.read(spark, dbase),
        "iceberg" -> IcebergInterop.read(spark, ibase),
        "graftlog" -> GraftLog.read(spark, lbase)).foreach {
      case (fmt, df) =>
        assert(normalized(df) == expected,
          s"seed=$seed: $fmt diverged from the model")
    }
    if (withIct) {
      // every Delta commit after enablement carries a strictly
      // monotone in-commit timestamp, whatever ops the seed composed
      val logDir = new java.io.File(dbase, "_delta_log")
      val perCommit: Seq[Option[Long]] = logDir.listFiles()
        .filter(_.getName.matches("\\d{20}\\.json"))
        .sortBy(_.getName)
        .map { f =>
          val first = java.nio.file.Files.readAllLines(f.toPath).get(0)
          val n = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(first)
          Option(n.get("commitInfo"))
            .flatMap(ci => Option(ci.get("inCommitTimestamp")))
            .map(_.asLong())
        }.toSeq
      val firstIct = perCommit.indexWhere(_.isDefined)
      assert(firstIct >= 0, s"seed=$seed: no ICT commit found")
      val after = perCommit.drop(firstIct)
      assert(after.forall(_.isDefined),
        s"seed=$seed: a post-enablement commit lacks an ICT " +
        s"(${after.count(_.isEmpty)} missing of ${after.size})")
      val icts = after.flatten
      assert(icts == icts.sorted && icts.distinct.size == icts.size,
        s"seed=$seed: ICTs not strictly monotone: $icts")
      assert(icts.size >= nOps / 2,
        s"seed=$seed: suspiciously few ICT commits (${icts.size})")
    }
    if (withClustering) {
      // the clustering domain survived every op (maintenance included);
      // value equality above proves the LSM rewrites lost nothing
      assert(DeltaInterop.clusteringColumns(
        DeltaInterop.snapshot(spark, dbase)) == Seq("k"),
        s"seed=$seed: clustering domain lost")
    }
    if (withNdvStats) {
      // whatever compaction refreshed or expire dropped along the way,
      // re-analyzing at HEAD is exact for the surviving keys (theta is
      // exact below nominal k at these sizes)
      val ndv = IcebergInterop.computeNdvStats(spark, ibase, Seq("k"))("k")
      val want = model.rows.map(_("k")).distinct.size.toLong
      assert(ndv == want, s"seed=$seed: NDV $ndv != $want distinct keys")
      assert(IcebergInterop.ndvEstimate(ibase, "k").map(_._2)
        .contains(want))
    }
    if (withWriteLayout) {
      // the sort order survived every op (rename/drop/restore/
      // maintenance): a COLUMN-LESS sorted rewrite still resolves it
      // from metadata, stamps every replacement file, and preserves
      // values exactly
      IcebergInterop.rewriteDataFilesSorted(spark, ibase,
        filesPerPartition = 2)
      assert(IcebergInterop.snapshot(spark, ibase).files
        .forall(_.sortOrderId.isDefined),
        s"seed=$seed: sorted rewrite left unstamped files")
      assert(normalized(IcebergInterop.read(spark, ibase)) == expected,
        s"seed=$seed: the sorted rewrite changed values")
      spark.conf.unset("spark.databricks.delta.autoCompact.minNumFiles")
    }
    if (icebergV3) {
      // the LINEAGE invariant survives every interleaving: after any
      // mix of DML, evolution, maintenance, and restore, every live
      // row still carries a row id and no two rows share one
      val ids = IcebergInterop.readWithRowIds(spark, ibase)
        .select(IcebergInterop.RowIdCol).collect()
      assert(ids.forall(!_.isNullAt(0)),
        s"seed=$seed: a v3 row lost its lineage id")
      val longs = ids.map(_.getLong(0)).toSeq
      assert(longs.distinct.size == longs.size,
        s"seed=$seed: duplicate v3 lineage ids after the sequence")
      assert(longs.size == model.rows.size)
    }
  }

  test("seeded DDL/DML sequences agree across all formats and the model") {
    runSequence(seed = 42, nOps = 18)
    runSequence(seed = 1337, nOps = 18)
    runSequence(seed = 7, nOps = 22)
    // a longer sequence reaches deeper op interleavings (restore after
    // maintenance after evolution) that short runs rarely compose
    runSequence(seed = 2026, nOps = 34)
  }

  test("v3 sequences: defaults-after-evolution and lineage hold " +
       "against the model") {
    runSequence(seed = 99, nOps = 20, icebergV3 = true,
      withDefaults = true)
    runSequence(seed = 2718, nOps = 26, icebergV3 = true,
      withDefaults = true)
    runSequence(seed = 31337, nOps = 20, icebergV3 = true)
  }

  test("promotion sequences: a mid-sequence int->long widening " +
       "composes with every later op on all three formats") {
    runSequence(seed = 4242, nOps = 22, withPromotion = true)
    runSequence(seed = 161803, nOps = 26, icebergV3 = true,
      withDefaults = true, withPromotion = true)
  }

  test("ICT sequences: every Delta commit stamps a monotone in-commit " +
       "timestamp through any op composition") {
    runSequence(seed = 777, nOps = 22, withIct = true)
    runSequence(seed = 271828, nOps = 20, icebergV3 = true,
      withPromotion = true, withIct = true)
  }

  test("uniform sequences: the Iceberg mirror equals the Delta table " +
       "after every operation") {
    runSequence(seed = 5150, nOps = 20, withUniform = true)
    runSequence(seed = 62831, nOps = 22, withUniform = true,
      withPromotion = true)
  }

  test("mirror sequences: the Delta mirror equals the Iceberg table " +
       "after every operation") {
    runSequence(seed = 90210, nOps = 20, withMirror = true)
    runSequence(seed = 14142, nOps = 22, withMirror = true,
      icebergV3 = true)
    runSequence(seed = 27182, nOps = 22, withMirror = true,
      withPromotion = true)
  }

  test("clustered + NDV-stats sequences: liquid cubes and theta " +
       "statistics survive every op composition") {
    runSequence(seed = 141421, nOps = 22, withClustering = true)
    runSequence(seed = 173205, nOps = 22, withNdvStats = true)
    runSequence(seed = 223606, nOps = 24, withClustering = true,
      withNdvStats = true, withPromotion = true)
  }

  test("write-layout sequences: sort order + range distribution and " +
       "optimized-write/auto-compact survive every op composition") {
    runSequence(seed = 314159, nOps = 22, withWriteLayout = true)
    runSequence(seed = 577215, nOps = 24, withWriteLayout = true,
      withPromotion = true, icebergV3 = true)
  }

  test("a full sequence through OBJECT-STORE semantics: flat keys, " +
       "conditional-PUT claims, copy mirrors — same model agreement") {
    val prior = graft.sources.TableIO.current
    graft.sources.TableIO.current =
      new graft.sources.ObjectStoreTableIO(conditionalCreate = true)
    try runSequence(seed = 8088, nOps = 20, icebergV3 = true,
      withPromotion = true)
    finally graft.sources.TableIO.current = prior
  }
}
