package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation, UnresolvedTable}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._

/** SQL DML surface for graft-log, Delta AND Iceberg tables: `MERGE
  * INTO` (incl. conditional clauses + composite ON keys), `DELETE
  * FROM`, `UPDATE` and `INSERT [OVERWRITE]` statements — the idiom
  * users actually type — parsed by SPARK'S OWN SQL parser and
  * dispatched to the table format's DML (`GraftLog.upsertScoped`/
  * `delete`, `DeltaDml.deleteVectoredWhere`/`updateWhere`/
  * `mergeUpsertKeys`, `IcebergInterop.deletePositionsWhere`/
  * `mergeUpsert`). Spark parses these
  * statements into `MergeIntoTable` / `DeleteFromTable` / `UpdateTable`
  * logical plans but refuses to execute them against v1 path-based
  * tables ("only supported with v2 tables"); this front-end is the
  * missing dispatch, not a second parser — grammar, precedence and
  * literals are all Spark's. Anything that is not DML against a
  * registered table falls through to plain `spark.sql`.
  *
  * Scale shape: the translation is driver-side string/plan work; the
  * executed DML is the same pruned upsert/delete every API caller gets
  * (zone-map file scoping, census deletes — see GraftLog's scaladocs). */
object GraftSql {

  private sealed trait Handler { def base: String }
  private final case class LogTable(base: String) extends Handler
  private final case class DeltaTable(base: String) extends Handler
  private final case class IceTable(base: String) extends Handler

  /** Per-SparkSession registry (name lowercased → handler): sessions in
    * one JVM (parallel suites, multi-tenant drivers) must not see each
    * other's registrations — a shared map would route one session's
    * DELETE at another's table path. Weak keys: a dropped session takes
    * its registrations with it. */
  private val sessions =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, Handler]]()

  private def tablesOf(spark: SparkSession): ConcurrentHashMap[String, Handler] =
    sessions.synchronized {
      var m = sessions.get(spark)
      if (m == null) { m = new ConcurrentHashMap[String, Handler](); sessions.put(spark, m) }
      m
    }

  /** Drop a registration (the temp view is left to the caller). */
  def unregisterTable(spark: SparkSession, name: String): Unit =
    tablesOf(spark).remove(name.toLowerCase)

  /** Register a graft-log table under a SQL name: readable via
    * `spark.sql("SELECT ... FROM name")` (temp view of the CURRENT
    * snapshot — refreshed after every DML through this front-end) and
    * writable via `GraftSql.sql("MERGE INTO name ...")`. */
  def registerTable(spark: SparkSession, name: String, base: String): Unit = {
    tablesOf(spark).put(name.toLowerCase, LogTable(base))
    GraftLog.registerView(spark, name, base)
  }

  /** Register a Delta table for SQL reads + DML: `DELETE FROM` routes
    * to `DeltaDml.deleteVectoredWhere` (merge-on-read DV delete),
    * `UPDATE` to `DeltaDml.updateWhere` (copy-on-write scoped to
    * touched files). */
  def registerDeltaTable(spark: SparkSession, name: String, base: String): Unit = {
    tablesOf(spark).put(name.toLowerCase, DeltaTable(base))
    graft.sources.DeltaInterop.read(spark, base).createOrReplaceTempView(name)
  }

  /** Register an Iceberg table for SQL reads + DML: `DELETE FROM`
    * routes to `deletePositionsWhere` (merge-on-read position
    * deletes), `MERGE INTO` to the single-snapshot equality-delete
    * upsert, `UPDATE` to the copy-on-write `updateWhere`, and
    * `INSERT [OVERWRITE]` to append/overwrite under the table's
    * identity partitioning. */
  def registerIcebergTable(spark: SparkSession, name: String, base: String): Unit = {
    tablesOf(spark).put(name.toLowerCase, IceTable(base))
    graft.sources.IcebergInterop.read(spark, base).createOrReplaceTempView(name)
  }

  private def refreshView(spark: SparkSession, name: String, h: Handler): Unit =
    h match {
      case LogTable(base) => GraftLog.registerView(spark, name, base)
      case DeltaTable(base) =>
        graft.sources.DeltaInterop.read(spark, base)
          .createOrReplaceTempView(name)
      case IceTable(base) =>
        graft.sources.IcebergInterop.read(spark, base)
          .createOrReplaceTempView(name)
    }

  /** The table's identity-partition columns for the Iceberg write
    * paths (the writer contract: partitionBy repeats the spec);
    * transformed specs refuse — the SQL front-end doesn't re-derive
    * them. */
  /** Execute one SQL statement. MERGE INTO / DELETE FROM / UPDATE on
    * registered tables run through the format's DML and return a
    * one-row frame (operation, version); everything else is
    * `spark.sql`. After the statement, UniForm mirrors of any Delta
    * table it committed to catch up (the statement layer is this
    * engine's post-commit hook — the same place delta-spark runs its
    * IcebergConverter). */
  def sql(spark: SparkSession, text: String): DataFrame = {
    val out = sqlImpl(spark, text)
    graft.sources.Uniform.tickTouched(spark)
    graft.sources.DeltaMirror.tickTouched(spark)
    out
  }

  private def sqlImpl(spark: SparkSession, text: String): DataFrame = {
    // Maintenance statements (OPTIMIZE / VACUUM / RESTORE / DESCRIBE
    // HISTORY) are warehouse-SQL idioms Spark's parser does not know —
    // intercepted by shape BEFORE parsePlan (whose failure would
    // otherwise route them into spark.sql's parse error).
    maintenanceSql(spark, text) match {
      case Some(df) => return df
      case None => ()
    }
    val plan =
      try spark.sessionState.sqlParser.parsePlan(text)
      catch { case _: Exception => return spark.sql(text) }
    plan match {
      case d: DeleteFromTable =>
        tableName(d.table) match {
          case Some(name) if tablesOf(spark).containsKey(name) =>
            runDelete(spark, name, d)
          case _ => spark.sql(text)
        }
      case u: UpdateTable =>
        tableName(u.table) match {
          case Some(name) if tablesOf(spark).containsKey(name) =>
            runUpdate(spark, name, u)
          case _ => spark.sql(text)
        }
      case m: MergeIntoTable =>
        tableName(m.targetTable) match {
          case Some(name) if tablesOf(spark).containsKey(name) =>
            runMerge(spark, name, m)
          case _ => spark.sql(text)
        }
      case i: InsertIntoStatement =>
        tableName(i.table) match {
          case Some(name) if tablesOf(spark).containsKey(name) =>
            runInsert(spark, name, i)
          case _ => spark.sql(text)
        }
      case AddColumns(t: UnresolvedTable, cols)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runAddColumns(spark, t.multipartIdentifier.last.toLowerCase, cols)
      case RenameColumn(t: UnresolvedTable, column, newName)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runRenameColumn(spark, t.multipartIdentifier.last.toLowerCase,
          column.name, newName)
      case AlterColumns(t: UnresolvedTable, specs)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runAlterColumnType(spark,
          t.multipartIdentifier.last.toLowerCase, specs)
      case DropColumns(t: UnresolvedTable, columns, ifExists)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runDropColumns(spark, t.multipartIdentifier.last.toLowerCase,
          columns.map(_.name), ifExists)
      case SetTableProperties(t: UnresolvedTable, props)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runSetProperties(spark, t.multipartIdentifier.last.toLowerCase, props)
      case org.apache.spark.sql.catalyst.plans.logical.AlterTableClusterBy(
            t: UnresolvedTable, specOpt)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runClusterBy(spark, t.multipartIdentifier.last.toLowerCase, specOpt)
      case org.apache.spark.sql.catalyst.plans.logical.AnalyzeColumn(
            t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
            colsOpt, allColumns)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runAnalyze(spark, t.multipartIdentifier.last.toLowerCase,
          colsOpt, allColumns)
      case org.apache.spark.sql.catalyst.plans.logical.AnalyzeTable(
            t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
            partitionSpec, _)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runAnalyzeTable(spark, t.multipartIdentifier.last.toLowerCase,
          partitionSpec)
      case org.apache.spark.sql.catalyst.plans.logical.ShowPartitions(
            t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable,
            specOpt, _)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        val filter: Map[String, String] = specOpt.collect {
          case org.apache.spark.sql.catalyst.analysis
                .UnresolvedPartitionSpec(m, _) => m
        }.getOrElse(Map.empty)
        runShowPartitions(spark,
          t.multipartIdentifier.last.toLowerCase, filter)
      // CHECK parses to its own node (the child is a pre-built
      // violation Filter over the relation — ignored here; the runner
      // probes existing data itself); PRIMARY KEY/UNIQUE/FK arrive as
      // the generic AddConstraint and refuse in the runner
      case a: AddCheckConstraint
          if tablesOf(spark)
            .containsKey(a.checkConstraint.tableName.toLowerCase) =>
        runAddConstraint(spark, a.checkConstraint.tableName.toLowerCase,
          a.checkConstraint)
      case AddConstraint(t: UnresolvedTable, constraint)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runAddConstraint(spark, t.multipartIdentifier.last.toLowerCase,
          constraint)
      case DropConstraint(t: UnresolvedTable, cname, ifExists, cascade)
          if tablesOf(spark)
            .containsKey(t.multipartIdentifier.last.toLowerCase) =>
        runDropConstraint(spark, t.multipartIdentifier.last.toLowerCase,
          cname, ifExists, cascade)
      case c: CreateTable =>
        (ddlName(c.name), specProvider(c.tableSpec)) match {
          case (Some(name), Some(p)) =>
            runCreateTable(spark, name, p, c)
          case _ => spark.sql(text)
        }
      case c: CreateTableAsSelect =>
        (ddlName(c.name), specProvider(c.tableSpec)) match {
          case (Some(name), Some(p)) =>
            runCtas(spark, name, p, c)
          case _ => spark.sql(text)
        }
      case r: ReplaceTable =>
        (ddlName(r.name), specProvider(r.tableSpec)) match {
          case (Some(name), Some(p)) =>
            runReplaceTable(spark, name, p, r)
          case _ => spark.sql(text)
        }
      case r: ReplaceTableAsSelect =>
        (ddlName(r.name), specProvider(r.tableSpec)) match {
          case (Some(name), Some(p)) =>
            runReplaceCtas(spark, name, p, r)
          case _ => spark.sql(text)
        }
      case d: DropTable =>
        ddlName(d.child) match {
          case Some(name) if tablesOf(spark).containsKey(name) =>
            runDrop(spark, name, d)
          case _ => spark.sql(text)
        }
      case TruncateTable(tbl) =>
        ddlName(tbl) match {
          case Some(name) if tablesOf(spark).containsKey(name) =>
            runTruncate(spark, name)
          case _ => spark.sql(text)
        }
      case r: RenameTable if !r.isView =>
        ddlName(r.child) match {
          case Some(name) if tablesOf(spark).containsKey(name) =>
            runRenameTable(spark, name,
              r.newName.last.toLowerCase)
          case _ => spark.sql(text)
        }
      case sc: ShowCreateTable =>
        // SHOW CREATE TABLE on a registered path-based table: emit a
        // statement THIS front-end re-executes to the same definition
        ddlName(sc.child) match {
          case Some(name) if tablesOf(spark).containsKey(name) =>
            import spark.implicits._
            Seq(showCreateDdl(spark, name, tablesOf(spark).get(name)))
              .toDF("createtab_stmt")
          case _ => spark.sql(text)
        }
      case p: ShowTableProperties =>
        // SHOW TBLPROPERTIES on a registered path-based table: Spark's
        // own runner refuses temp views, so the dispatch answers from
        // the format's metadata (Delta configuration; the others have
        // no property store and return the empty set)
        ddlName(p.table) match {
          case Some(name) if tablesOf(spark).containsKey(name) =>
            val props: Map[String, String] =
              tablesOf(spark).get(name) match {
                case DeltaTable(base) =>
                  graft.sources.DeltaInterop.snapshot(spark, base)
                    .configuration
                case _ => Map.empty
              }
            import spark.implicits._
            val rows = p.propertyKey match {
              case Some(k) => props.get(k).map(v => (k, v)).toSeq
              case None => props.toSeq.sortBy(_._1)
            }
            rows.toDF("key", "value")
          case _ => spark.sql(text)
        }
      case other if other.exists {
            case _: RelationTimeTravel => true; case _ => false } =>
        runTimeTravel(spark, other).getOrElse(spark.sql(text))
      case _ => spark.sql(text)
    }
  }

  // ----------------------------------------------------- maintenance

  // The statements users type against a real warehouse but Spark's
  // parser rejects: Delta-SQL's OPTIMIZE / VACUUM / RESTORE / DESCRIBE
  // HISTORY (reference's maintenance layer is `aws s3 sync` + manual
  // re-runs; these are the engine-side idioms). Shape-matched on the
  // whole statement; a match against an UNREGISTERED table refuses
  // loudly — falling through would surface Spark's parse error, which
  // misdiagnoses a perfectly valid maintenance statement.
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+([`\w.]+)\s*(?:WHERE\s+(.+?))?""" +
     """\s*(?:ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""").r
  private val VacuumRe =
    ("""(?is)\s*VACUUM\s+([`\w.]+)\s*(?:RETAIN\s+(\d+)\s+HOURS)?""" +
     """\s*(DRY\s+RUN)?\s*;?\s*""").r
  private val RestoreRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([`\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTsRe =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?([`\w.]+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+""" +
     """'([^']+)'\s*;?\s*""").r
  private val HistoryRe =
    """(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+([`\w.]+)\s*;?\s*""".r
  private val CopyIntoRe =
    ("""(?is)\s*COPY\s+INTO\s+([`\w.]+)\s+FROM\s+'([^']+)'\s+""" +
     """FILEFORMAT\s*=\s*(\w+)\s*(?:PATTERN\s*=\s*'([^']+)')?\s*;?\s*""").r
  private val ReorgRe =
    """(?is)\s*REORG\s+TABLE\s+([`\w.]+)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  private val CloneRe =
    ("""(?is)\s*CREATE\s+TABLE\s+([`\w.]+)\s+(SHALLOW\s+|DEEP\s+)?CLONE\s+([`\w.]+)""" +
     """\s*(?:VERSION\s+AS\s+OF\s+(\d+))?\s+LOCATION\s+'([^']+)'\s*;?\s*""").r
  private val DetailRe =
    """(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+([`\w.]+)\s*;?\s*""".r
  private val ConvertRe =
    ("""(?is)\s*CONVERT\s+([`\w.]+)\s+TO\s+(DELTA|ICEBERG3?)\s+AS\s+""" +
     """([`\w.]+)\s+LOCATION\s+'([^']+)'\s*;?\s*""").r
  private val CreateRefRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+CREATE\s+(TAG|BRANCH)\s+""" +
     """([`\w-]+)\s*(?:AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""").r
  private val DropRefRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+DROP\s+(TAG|BRANCH)\s+""" +
     """([`\w-]+)\s*;?\s*""").r
  private val AddPartFieldRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+ADD\s+PARTITION\s+FIELD\s+""" +
     """([^;]+?)\s*;?\s*""").r
  private val DropPartFieldRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+DROP\s+PARTITION\s+FIELD\s+""" +
     """([^;]+?)\s*;?\s*""").r
  // Iceberg's write-layout DDL (the Spark-extensions syntax):
  //   WRITE ORDERED BY c1 [ASC|DESC], ...       → range-distribute + sort
  //   WRITE LOCALLY ORDERED BY ...              → sort only (no shuffle)
  //   WRITE DISTRIBUTED BY PARTITION
  //     [LOCALLY ORDERED BY ...]                → hash-distribute [+ sort]
  //   WRITE UNORDERED                           → reset both
  private val WriteOrderedRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+WRITE\s+""" +
     """(DISTRIBUTED\s+BY\s+PARTITION\s+)?(LOCALLY\s+)?ORDERED\s+BY\s+""" +
     """([^;]+?)\s*;?\s*""").r
  private val WriteDistributedRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+WRITE\s+DISTRIBUTED\s+BY\s+""" +
     """PARTITION\s*;?\s*""").r
  private val WriteUnorderedRe =
    """(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+WRITE\s+UNORDERED\s*;?\s*""".r

  /** One transform expression of Iceberg's partition DDL — a bare
    * column (identity), `bucket(N, col)`, `truncate(col, W)`, or
    * `years|months|days|hours(col)` — as (source column, transform). */
  private def parsePartTransform(rest0: String)
  : (String, graft.sources.IcebergInterop.IceTransform) = {
    import graft.sources.IcebergInterop.IceTransform
    val rest = rest0.trim.replace("`", "")
    val FnRe = """(?is)(\w+)\s*\(\s*([^)]+?)\s*\)""".r
    rest match {
      case FnRe(fn, args0) =>
        val args = args0.split(',').map(_.trim).toSeq
        def one(): String = {
          require(args.size == 1,
            s"$fn takes one column, got (${args.mkString(", ")})"); args.head }
        fn.toLowerCase match {
          case "bucket" =>
            require(args.size == 2 && args.head.forall(_.isDigit),
              s"bucket takes (N, col), got (${args.mkString(", ")})")
            (args(1), IceTransform.Bucket(args.head.toInt))
          case "truncate" =>
            require(args.size == 2,
              s"truncate takes (col, W), got (${args.mkString(", ")})")
            // Iceberg's SQL order is (col, W); accept (W, col) too
            if (args(1).forall(_.isDigit))
              (args.head, IceTransform.Truncate(args(1).toInt))
            else {
              require(args.head.forall(_.isDigit),
                s"truncate needs an integer width in (${args.mkString(", ")})")
              (args(1), IceTransform.Truncate(args.head.toInt))
            }
          case "year" | "years" => (one(), IceTransform.Year)
          case "month" | "months" => (one(), IceTransform.Month)
          case "day" | "days" => (one(), IceTransform.Day)
          case "hour" | "hours" => (one(), IceTransform.Hour)
          case other => throw new IllegalArgumentException(
            s"unknown partition transform '$other' (have bucket, " +
            "truncate, years, months, days, hours)")
        }
      case c if c.matches("""(?s)[\w]+""") => (c, IceTransform.Identity)
      case other => throw new IllegalArgumentException(
        s"cannot parse partition field '$other'")
    }
  }

  /** The CREATE TABLE statement that re-creates the table's DEFINITION
    * (columns, partitioning, properties, location) through this same
    * front-end — the round-trip property the spec pins. Engine-managed
    * field metadata (column mapping, generated/identity columns) has
    * no faithful DDL rendering here and refuses rather than emitting a
    * statement that silently recreates a DIFFERENT table. */
  private def showCreateDdl(spark: SparkSession, name: String,
                            h: Handler): String = {
    val (provider, base, schema, parts, props) = h match {
      case LogTable(b) =>
        val sn = GraftLog.snapshot(b)
        val sch = sn.schemaJson.map(j =>
          org.apache.spark.sql.types.DataType.fromJson(j)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
          .getOrElse(spark.table(name).schema)
        ("graftlog", b, sch, Seq.empty[String], Map.empty[String, String])
      case DeltaTable(b) =>
        val sn = graft.sources.DeltaInterop.snapshot(spark, b)
        require(sn.columnMappingMode == "none",
          "SHOW CREATE TABLE on a column-mapped Delta table is not " +
          "supported — the physical-name mapping has no DDL rendering")
        require(graft.sources.DeltaInterop.generatedColumnsOf(sn.schema)
            .isEmpty &&
          graft.sources.DeltaInterop.identityColumnOf(sn.schema).isEmpty,
          "SHOW CREATE TABLE with generated/identity columns is not " +
          "supported — their clauses have no faithful rendering here")
        ("delta", b, sn.schema, sn.partitionColumns, sn.configuration)
      case IceTable(b) =>
        val sn = graft.sources.IcebergInterop.snapshot(spark, b)
        // render the FULL spec, transforms included — emitting only the
        // identity fields would silently recreate a DIFFERENT table for
        // a bucket/day-partitioned one (the exact hazard this function
        // refuses for column-mapping/generated columns on Delta)
        val rendered = sn.specFields.map(f => renderIceSpecField(f,
          sn.fieldNamesById.getOrElse(f.sourceId, f.name)))
        ("iceberg", b, sn.schema, rendered, Map.empty[String, String])
    }
    val cols = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partClause =
      if (parts.isEmpty) ""
      else parts.mkString(" PARTITIONED BY (", ", ", ")")
    val propClause =
      if (props.isEmpty) ""
      else props.toSeq.sorted.map { case (k, v) => s"'$k' = '$v'" }
        .mkString(" TBLPROPERTIES (", ", ", ")")
    s"CREATE TABLE $name ($cols) USING $provider" +
      partClause + propClause + s" LOCATION '$base'"
  }

  private def registered(spark: SparkSession, raw: String): Boolean =
    tablesOf(spark).containsKey(
      raw.replace("`", "").split('.').last.toLowerCase)

  private def maintTable(spark: SparkSession, raw: String,
                         stmt: String): (String, Handler) = {
    val name = raw.replace("`", "").split('.').last.toLowerCase
    val h = tablesOf(spark).get(name)
    require(h != null,
      s"$stmt: '$name' is not a registered graft-log/Delta/Iceberg table")
    (name, h)
  }

  /** OPTIMIZE bin-packs small files (Delta `optimize`, graft-log
    * `compactIncremental`, Iceberg `rewriteDataFiles` — each format's
    * own compaction, same data back, fewer files); `ZORDER BY` is the
    * Delta clustering rewrite. VACUUM deletes files no retained
    * version references (`RETAIN n HOURS` overrides each format's
    * default safety window; on Iceberg it is orphan-file removal —
    * snapshot EXPIRATION is a separate, time-travel-destroying
    * operation kept out of VACUUM on purpose). RESTORE commits a new
    * version whose content is an old version's (history preserved).
    * DESCRIBE HISTORY returns the format's commit log as a frame. */
  private def maintenanceSql(spark: SparkSession,
                             text: String): Option[DataFrame] = text match {
    // CONVERT <src> TO DELTA|ICEBERG AS <name> LOCATION '<dst>' —
    // zero-copy cross-format conversion (the engine-side shape of
    // Delta's CONVERT TO DELTA / Iceberg's snapshot action): the new
    // table references the source's data files (partitioned Delta
    // sources convert zero-copy too — identity tuples ride in the
    // manifests, spec §Column Projection); refusal matrix (DVs,
    // merge-on-read deletes, mapping, transformed specs) lives in the
    // convert implementations
    case ConvertRe(src, fmt, newName, loc) =>
      val (_, h) = maintTable(spark, src, "CONVERT")
      val name = newName.toLowerCase.replace("`", "")
      require(!tablesOf(spark).contains(name),
        s"table '$name' is already registered — pick another name")
      (h, fmt.toUpperCase) match {
        case (IceTable(base), "DELTA") =>
          graft.sources.DeltaInterop.convertFromIceberg(spark, base, loc)
          registerDeltaTable(spark, name, loc)
        case (DeltaTable(base), "ICEBERG") =>
          graft.sources.IcebergInterop.convertFromDelta(spark, base, loc)
          registerIcebergTable(spark, name, loc)
        case (DeltaTable(base), "ICEBERG3") =>
          // format-v3 target: live deletion vectors carry BYTE-VERBATIM
          // (the puffin DV blob is Delta's frame, spec v3 §Deletion
          // Vectors) — no decode, no positionalization
          graft.sources.IcebergInterop.convertFromDelta(spark, base, loc,
            formatVersion = 3)
          registerIcebergTable(spark, name, loc)
        case (IceTable(base), "ICEBERG3") =>
          throw new IllegalArgumentException(
            s"CONVERT: '$src' is already iceberg — upgrade in place with " +
            "ALTER TABLE ... SET TBLPROPERTIES ('format-version'='3')")
        case (IceTable(_), "ICEBERG") | (DeltaTable(_), "DELTA") =>
          throw new IllegalArgumentException(
            s"CONVERT: '$src' is already ${fmt.toLowerCase} — use CLONE")
        case (LogTable(base), f @ ("DELTA" | "ICEBERG" | "ICEBERG3")) =>
          // fully zero-copy, vectored-delete state included: the log's
          // DV sidecars share the row-index coordinate system with both
          // targets' merge-on-read encodings, so deleted positions
          // TRANSLATE (Delta DVs / Iceberg position deletes) and no
          // data file is touched
          val snap = GraftLog.snapshot(base)
          val deleted: Map[String, Seq[Long]] =
            GraftLog.deletedPositions(spark, base).map { case (p, ps) =>
              graft.sources.PathCodec.absNorm(s"$base/$p") -> ps
            }
          val schema = snap.schemaJson.map(j =>
            org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[org.apache.spark.sql.types.StructType])
            .getOrElse(spark.read.parquet(
              snap.files.map(p => s"$base/$p"): _*).schema)
          // graft-log's tracked per-file min/max translate into
          // Delta-style stats JSON, so both targets' data skipping
          // works from the first read
          val statsJson: Map[String, String] = snap.files.flatMap { p =>
            val abs = graft.sources.PathCodec.absNorm(s"$base/$p")
            snap.fileStats.get(p).map { fs =>
              val root = GraftLog.mapper.createObjectNode()
              val mnO = root.putObject("minValues")
              val mxO = root.putObject("maxValues")
              fs.foreach { case (c, cs) =>
                cs.minMax.foreach { case (mn, mx) =>
                  mnO.set[com.fasterxml.jackson.databind.JsonNode](c, mn)
                  mxO.set[com.fasterxml.jackson.databind.JsonNode](c, mx)
                }
              }
              abs -> GraftLog.mapper.writeValueAsString(root)
            }
          }.toMap
          val absFiles = snap.files.map(p =>
            graft.sources.PathCodec.absNorm(s"$base/$p"))
          f match {
            case "DELTA" =>
              graft.sources.DeltaInterop.convertFromParquetFiles(
                spark, loc, absFiles, schema, statsJson.get _,
                positionDeletes = deleted)
              registerDeltaTable(spark, name, loc)
            case "ICEBERG3" =>
              // graft-log DV sidecars re-frame as puffin blobs (same
              // bitmap serialization; only the container differs)
              graft.sources.IcebergInterop.writeConvertedIceberg(
                spark, loc, schema, Seq.empty,
                absFiles.map(a => (a, statsJson.get(a), Map.empty[String, String])),
                formatVersion = 3,
                dvBlobs = deleted.toSeq.map { case (p, ps) =>
                  (p, graft.sources.Puffin.dvBlobBytes(ps),
                    ps.distinct.size.toLong) })
              registerIcebergTable(spark, name, loc)
            case _ =>
              graft.sources.IcebergInterop.writeConvertedIceberg(
                spark, loc, schema, Seq.empty,
                absFiles.map(a => (a, statsJson.get(a), Map.empty[String, String])),
                positionDeletes = deleted.toSeq)
              registerIcebergTable(spark, name, loc)
          }
        case other => throw new IllegalArgumentException(
          s"CONVERT: unsupported source/format pair $other")
      }
      Some(result(spark, "CONVERT", 0L))
    case OptimizeRe(t, whereCl, zcols) =>
      val (name, h) = maintTable(spark, t, "OPTIMIZE")
      val zorder = Option(zcols).map(
        _.split(',').map(_.trim.replace("`", "")).toSeq.filter(_.nonEmpty))
      // OPTIMIZE ... WHERE: equality conjunctions on partition columns
      // only (delta-spark's own restriction) — values compared against
      // the log's serialized partition records, the same contract as
      // read(partitionFilters)
      val pf: Map[String, String] = Option(whereCl).map { w =>
        w.split("(?i)\\s+AND\\s+").map { c =>
          val EqRe = """(?s)\s*`?(\w+)`?\s*=\s*(?:'([^']*)'|(\S+))\s*""".r
          c match {
            case EqRe(k, q, bare) =>
              k.toLowerCase -> Option(q).getOrElse(bare)
            case other => throw new IllegalArgumentException(
              s"OPTIMIZE WHERE supports equality conjunctions on " +
              s"partition columns only (got '$other')")
          }
        }.toMap
      }.getOrElse(Map.empty)
      require(pf.isEmpty || zorder.isEmpty,
        "OPTIMIZE WHERE does not combine with ZORDER BY here — scope " +
        "the clustering rewrite by partition via the API instead")
      val v = (h, zorder) match {
        case (DeltaTable(base), None) =>
          graft.sources.DeltaInterop.optimize(spark, base,
              partitionFilter = pf)
            .getOrElse(graft.sources.DeltaInterop.snapshot(spark, base).version)
        case (DeltaTable(base), Some(cols)) =>
          graft.sources.DeltaInterop.optimizeZorder(spark, base, cols)
            .getOrElse(graft.sources.DeltaInterop.snapshot(spark, base).version)
        case (LogTable(base), None) =>
          require(pf.isEmpty,
            "OPTIMIZE WHERE on a graft-log table: graft-log tables are " +
            "unpartitioned — compaction is always whole-table")
          GraftLog.compactIncremental(spark, base,
            minBytes = 128L << 20, targetRowsPerFile = 1L << 20)
        case (IceTable(base), None) =>
          graft.sources.IcebergInterop.rewriteDataFiles(spark, base,
            partitionFilter = pf)
        case (_, Some(_)) => throw new IllegalArgumentException(
          "OPTIMIZE ... ZORDER BY is a Delta clustering rewrite — for " +
          "graft-log use overwriteClustered, for Iceberg a sorted rewrite")
      }
      refreshView(spark, name, h)
      Some(result(spark, "OPTIMIZE", v))
    case VacuumRe(t, hours, dry) =>
      val (name, h) = maintTable(spark, t, "VACUUM")
      val retainMs = Option(hours).map(_.toLong * 3600 * 1000)
      val dryRun = dry != null // preview: report, touch nothing
      val removed = h match {
        case DeltaTable(base) => graft.sources.DeltaInterop.vacuum(
          spark, base, retainMs.getOrElse(7L * 24 * 3600 * 1000),
          dryRun = dryRun).size
        case LogTable(base) if dryRun =>
          throw new IllegalArgumentException(
            "VACUUM ... DRY RUN on a graft-log table is not supported — " +
            "its vacuum squashes the log as part of the operation, so " +
            "there is no side-effect-free preview")
        case LogTable(base) =>
          // keep every version inside the retention window (Delta's
          // VACUUM never destroys in-window time travel; squashing the
          // whole log to one version would)
          val ret = retainMs.getOrElse(600000L)
          val cutoff = System.currentTimeMillis() - ret
          val keep = math.max(1,
            GraftLog.commits(base).count(_.timestampMs >= cutoff))
          GraftLog.vacuum(base, keepVersions = keep, retentionMs = ret)
        case IceTable(base) => graft.sources.IcebergInterop.removeOrphanFiles(
          spark, base,
          retainMs.map(System.currentTimeMillis() - _),
          dryRun = dryRun).size
      }
      import spark.implicits._
      Some(Seq((if (dryRun) "VACUUM DRY RUN" else "VACUUM",
        removed.toLong)).toDF("operation", "n_removed"))
    case RestoreRe(t, ver) =>
      val (name, h) = maintTable(spark, t, "RESTORE")
      val v = h match {
        case LogTable(base) => GraftLog.restore(spark, base, ver.toLong)
        case DeltaTable(base) =>
          graft.sources.DeltaInterop.restore(spark, base, ver.toLong)
        case IceTable(base) =>
          // Iceberg has no dense version numbers — RESTORE takes the
          // SNAPSHOT ID (the unit its own rollback procedure uses)
          graft.sources.IcebergInterop.rollbackTo(base, ver.toLong)
      }
      refreshView(spark, name, h)
      Some(result(spark, "RESTORE", v))
    // timestamp form: each format resolves the version current at the
    // instant through its own clock record (Delta: in-commit
    // timestamps when written, else mtime; Iceberg: the snapshot-log,
    // so a restore ACROSS a rollback lands on what readers then saw)
    case RestoreTsRe(t, tsLit) =>
      val (name, h) = maintTable(spark, t, "RESTORE")
      val ms = java.sql.Timestamp.valueOf(tsLit.trim).getTime
      val v = h match {
        case LogTable(base) =>
          GraftLog.restore(spark, base,
            GraftLog.snapshot(base, asOfTimestampMs = Some(ms)).version)
        case DeltaTable(base) =>
          graft.sources.DeltaInterop.restore(spark, base,
            graft.sources.DeltaInterop.versionAtTimestamp(base, ms))
        case IceTable(base) =>
          graft.sources.IcebergInterop.rollbackTo(base,
            graft.sources.IcebergInterop.snapshotIdAsOf(base, ms))
      }
      refreshView(spark, name, h)
      Some(result(spark, "RESTORE", v))
    case HistoryRe(t) if registered(spark, t) =>
      // guarded on registration: `DESCRIBE history some_col` is Spark's
      // describe-COLUMN syntax on a table literally named history —
      // an unregistered match falls through to spark.sql untouched
      val (_, h) = maintTable(spark, t, "DESCRIBE HISTORY")
      Some(h match {
        case LogTable(base) => GraftLog.history(spark, base)
        case DeltaTable(base) => graft.sources.DeltaInterop.history(spark, base)
        case IceTable(base) =>
          graft.sources.IcebergInterop.historyTable(spark, base)
      })
    case CopyIntoRe(t, path, fmt, pattern) =>
      Some(runCopyInto(spark, t, path, fmt, Option(pattern)))
    case ReorgRe(t) =>
      // `REORG TABLE t APPLY (PURGE)`: rewrite exactly the DV-carrying
      // files so soft-deleted rows physically disappear and VACUUM can
      // reclaim the bins — the guaranteed end of a merge-on-read delete
      val (name, h) = maintTable(spark, t, "REORG")
      h match {
        case DeltaTable(base) =>
          val v = graft.sources.DeltaInterop.reorgPurge(spark, base)
            .getOrElse(graft.sources.DeltaInterop.snapshot(spark, base).version)
          refreshView(spark, name, h)
          Some(result(spark, "REORG", v))
        case _ => throw new IllegalArgumentException(
          "REORG ... APPLY (PURGE) is the Delta deletion-vector purge — " +
          "graft-log purges DVs via compact, Iceberg via rewriteDataFiles")
      }
    case CloneRe(t, kind, srcT, ver, loc) =>
      // `CREATE TABLE c [SHALLOW|DEEP] CLONE s [VERSION AS OF n]
      // LOCATION p`: shallow = zero-copy absolute-path references into
      // the source; deep (the default, like Delta's) = hard-linked
      // independent copy the source's vacuum can never break
      val shallow = Option(kind).exists(_.trim.equalsIgnoreCase("SHALLOW"))
      val tgt = t.replace("`", "").split('.').last.toLowerCase
      val (_, h) = maintTable(spark, srcT, "CLONE")
      h match {
        case DeltaTable(srcBase) =>
          require(!tablesOf(spark).containsKey(tgt),
            s"CLONE: table '$tgt' is already registered")
          if (shallow)
            graft.sources.DeltaInterop.shallowClone(spark, srcBase, loc,
              Option(ver).map(_.toLong))
          else
            graft.sources.DeltaInterop.deepClone(spark, srcBase, loc,
              Option(ver).map(_.toLong))
          registerDeltaTable(spark, tgt, loc)
          Some(result(spark, if (shallow) "SHALLOW CLONE" else "CLONE", 0L))
        case _ => throw new IllegalArgumentException(
          "CLONE is a Delta operation — the source must be a " +
          "registered Delta table")
      }
    case DetailRe(t) if registered(spark, t) =>
      // `DESCRIBE DETAIL t`: the one-row table summary (format,
      // location, partitioning, live file count/bytes, version) — all
      // from metadata already in memory; no data file is opened
      val (_, h) = maintTable(spark, t, "DESCRIBE DETAIL")
      import spark.implicits._
      val (fmt, loc2, parts, nf, bytes, ver2) = h match {
        case DeltaTable(base) =>
          val snap = graft.sources.DeltaInterop.snapshot(spark, base)
          ("delta", base, snap.partitionColumns,
            snap.files.size.toLong,
            snap.files.map(f => graft.sources.TableIO().length(
              graft.sources.DeltaInterop.resolveDataFile(base, f.path))).sum,
            snap.version)
        case LogTable(base) =>
          val snap = GraftLog.snapshot(base)
          ("graftlog", base, Seq.empty[String], snap.files.size.toLong,
            snap.files.map(f => graft.sources.TableIO().length(
              graft.sources.TableIO.join(base, f))).sum,
            snap.version)
        case IceTable(base) =>
          val snap = graft.sources.IcebergInterop.snapshot(spark, base)
          ("iceberg", base, snap.partitionColumns,
            snap.files.size.toLong,
            snap.files.map(f => graft.sources.TableIO().length(f.path)).sum,
            snap.snapshotId)
      }
      Some(Seq((fmt, loc2, parts, nf, bytes, ver2)).toDF(
        "format", "location", "partition_columns", "num_files",
        "size_in_bytes", "version"))
    // Iceberg partition evolution (spec §Partition Evolution) —
    // metadata only: future writes use the new default spec, existing
    // files keep their old partition records and reads prune each file
    // through the spec it was written under. Iceberg-only surface:
    // graft-log tables are unpartitioned by design, and Delta cannot
    // change partitioning without rewriting the table.
    case AddPartFieldRe(t, rest) if registered(spark, t) =>
      val (name, h) = maintTable(spark, t, "ADD PARTITION FIELD")
      Some(evolvePartitionSql(spark, name, h, add = Some(rest), drop = None))
    case DropPartFieldRe(t, rest) if registered(spark, t) =>
      val (name, h) = maintTable(spark, t, "DROP PARTITION FIELD")
      Some(evolvePartitionSql(spark, name, h, add = None, drop = Some(rest)))
    // Iceberg write-layout DDL: sort order (spec §Sorting) + the
    // write.distribution-mode property steering the pre-write shuffle.
    // ORDERED BY without LOCALLY range-distributes (globally disjoint
    // per-file ranges — the layout readRange prunes best); LOCALLY
    // keeps the incoming distribution and only sorts within tasks.
    case WriteOrderedRe(t, distOpt, locallyOpt, cols)
        if registered(spark, t) =>
      val (name, h) = maintTable(spark, t, "WRITE ORDERED BY")
      val base = iceBaseOf(name, h, "WRITE ORDERED BY")
      val fields = cols.split(",").map(_.trim).filter(_.nonEmpty).map { c =>
        val parts = c.replace("`", "").split("\\s+")
        val asc = parts.length < 2 || !parts(1).equalsIgnoreCase("DESC")
        (parts(0), asc)
      }.toSeq
      graft.sources.IcebergInterop.setSortOrder(base, fields)
      val mode =
        if (Option(distOpt).exists(_.nonEmpty)) "hash"
        else if (Option(locallyOpt).exists(_.nonEmpty)) "none"
        else "range"
      val v = graft.sources.IcebergInterop.setTableProperties(base,
        Map("write.distribution-mode" -> mode))
      Some(result(spark, "WRITE ORDERED BY", v))
    case WriteDistributedRe(t) if registered(spark, t) =>
      val (name, h) = maintTable(spark, t, "WRITE DISTRIBUTED BY PARTITION")
      val base = iceBaseOf(name, h, "WRITE DISTRIBUTED BY PARTITION")
      val v = graft.sources.IcebergInterop.setTableProperties(base,
        Map("write.distribution-mode" -> "hash"))
      Some(result(spark, "WRITE DISTRIBUTED BY PARTITION", v))
    case WriteUnorderedRe(t) if registered(spark, t) =>
      val (name, h) = maintTable(spark, t, "WRITE UNORDERED")
      val base = iceBaseOf(name, h, "WRITE UNORDERED")
      graft.sources.IcebergInterop.setSortOrder(base, Seq.empty)
      val v = graft.sources.IcebergInterop.setTableProperties(base,
        Map("write.distribution-mode" -> "none"))
      Some(result(spark, "WRITE UNORDERED", v))
    // Iceberg refs (spec §Snapshot References): named TAGs pin a
    // snapshot (audit/release anchors that survive expireSnapshots'
    // ref-retention rules), BRANCHes are writable lines readable via
    // `VERSION AS OF '<name>'` and published with fastForward
    case CreateRefRe(t, kind, refName, verOpt) if registered(spark, t) =>
      val (name, h) = maintTable(spark, t, s"CREATE ${kind.toUpperCase}")
      val base = h match {
        case IceTable(b) => b
        case _ => throw new IllegalArgumentException(
          s"CREATE ${kind.toUpperCase}: '$name' is not an Iceberg table " +
          "— named refs are an Iceberg feature")
      }
      val sid = Option(verOpt).map(_.toLong).getOrElse(
        graft.sources.IcebergInterop.resolveRef(base, "main"))
      val rn = refName.replace("`", "")
      if (kind.equalsIgnoreCase("TAG"))
        graft.sources.IcebergInterop.createTag(base, rn, sid)
      else graft.sources.IcebergInterop.createBranch(base, rn, sid)
      Some(result(spark, s"CREATE ${kind.toUpperCase}", sid))
    case DropRefRe(t, kind, refName) if registered(spark, t) =>
      val (name, h) = maintTable(spark, t, s"DROP ${kind.toUpperCase}")
      val base = h match {
        case IceTable(b) => b
        case _ => throw new IllegalArgumentException(
          s"DROP ${kind.toUpperCase}: '$name' is not an Iceberg table " +
          "— named refs are an Iceberg feature")
      }
      graft.sources.IcebergInterop.dropRef(base, refName.replace("`", ""))
      Some(result(spark, s"DROP ${kind.toUpperCase}", -1L))
    case _ => None
  }

  private def iceBaseOf(name: String, h: Handler, stmt: String): String =
    h match {
      case IceTable(b) => b
      case _ => throw new IllegalArgumentException(
        s"$stmt: '$name' is not an Iceberg table — write-layout DDL " +
        "is an Iceberg feature (Delta clusters via CLUSTER BY / " +
        "OPTIMIZE ZORDER)")
    }

  private def evolvePartitionSql(spark: SparkSession, name: String,
                                 h: Handler, add: Option[String],
                                 drop: Option[String]): DataFrame = {
    import graft.sources.IcebergInterop
    val base = h match {
      case IceTable(b) => b
      case _ => throw new IllegalArgumentException(
        s"ALTER TABLE ... ${if (add.isDefined) "ADD" else "DROP"} " +
        s"PARTITION FIELD: '$name' is not an Iceberg table — partition " +
        "evolution is an Iceberg feature (Delta/graft-log partitioning " +
        "is fixed at write time)")
    }
    val specId = add match {
      case Some(rest) =>
        IcebergInterop.evolveSpec(spark, base,
          add = Seq(parsePartTransform(rest)))
      case None =>
        val (src, tr) = parsePartTransform(drop.get)
        // resolve to the spec field's conventional name and check the
        // dropped definition is the one the user named — dropping
        // `bucket(8, c)` must not silently remove a bucket[16] field
        val fieldName =
          if (tr == IcebergInterop.IceTransform.Identity) src
          else s"$src${tr.suffix}"
        val cur = IcebergInterop.snapshot(spark, base)
        cur.specFields.find(_.name == fieldName).foreach { f =>
          require(tr == IcebergInterop.IceTransform.Identity ||
              f.transform == tr.spec,
            s"partition field '$fieldName' is ${f.transform}, not " +
            s"${tr.spec} — name the field's actual transform")
        }
        IcebergInterop.evolveSpec(spark, base, add = Seq.empty,
          drop = Seq(fieldName))
    }
    refreshView(spark, name, h)
    import spark.implicits._
    val spec = IcebergInterop.tableSpec(spark, base)
      .map { case (c, t) => s"$c=${t.spec}" }.mkString(", ")
    Seq((if (add.isDefined) "ADD PARTITION FIELD"
         else "DROP PARTITION FIELD", specId.toLong, spec))
      .toDF("operation", "spec_id", "default_spec")
  }

  /** `COPY INTO <t> FROM '<dir>' FILEFORMAT = PARQUET|CSV|JSON
    * [PATTERN = '<glob>']` — EXACTLY-ONCE FILE loading: each source
    * file appends under a per-file transaction id (graft-log commit
    * txnId, Delta txn action, Iceberg snapshot-summary batch gate), so
    * a re-run — after a crash, or after new files landed — loads ONLY
    * the files the table has not recorded yet. The file is the
    * idempotence unit because it is the retry unit: one commit per new
    * file keeps ledger entry and data atomic (a statement-level ledger
    * would double-load on a mid-statement crash). Ad-hoc/backfill
    * shape; CONTINUOUS high-volume ingest belongs to the streaming
    * sinks (`EventStreams.streamIngest*` — the file-stream checkpoint
    * is a native file ledger with one commit per many-file batch).
    * Source rows conform to the TABLE's schema (same column set,
    * implicit casts), CSV via header names, never position. */
  private def runCopyInto(spark: SparkSession, t: String, path: String,
                          fmt: String, pattern: Option[String]): DataFrame = {
    val (name, h) = maintTable(spark, t, "COPY INTO")
    val format = fmt.toLowerCase
    require(Set("parquet", "csv", "json").contains(format),
      s"COPY INTO FILEFORMAT must be PARQUET, CSV or JSON — got $fmt")
    val tio = graft.sources.TableIO()
    require(tio.exists(path), s"COPY INTO source not found: $path")
    val matcher = pattern.map(p =>
      java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$p"))
    def nameOf(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val files: Seq[String] =
      (if (!tio.isDirectory(path)) Seq(path)
       else tio.list(path).sorted
         .map(n => graft.sources.TableIO.join(path, n))
         .filterNot(tio.isDirectory))
      .filter { p =>
        val n = nameOf(p)
        !n.startsWith("_") && !n.startsWith(".") &&
        matcher.forall(_.matches(java.nio.file.Paths.get(n)))
      }
    // the DECLARED schema governs conformance (the read view's schema
    // reports parquet nullability, not the table contract — an Iceberg
    // required column would look nullable there and fail the commit)
    val tableSchema: org.apache.spark.sql.types.StructType = h match {
      case LogTable(base) => GraftLog.snapshot(base).schemaJson
        .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        .getOrElse(spark.table(name).schema)
      case DeltaTable(base) =>
        graft.sources.DeltaInterop.snapshot(spark, base).schema
      case IceTable(base) =>
        graft.sources.IcebergInterop.snapshot(spark, base).schema
    }
    def conform(raw: DataFrame, f: String): DataFrame = {
      require(raw.columns.toSet == tableSchema.fieldNames.toSet,
        s"COPY INTO source file $f must carry exactly the table " +
        s"columns (${tableSchema.fieldNames.mkString(",")}), " +
        s"got (${raw.columns.mkString(",")})")
      raw.select(tableSchema.fields.map { fld =>
        val c = org.apache.spark.sql.functions.col(fld.name)
          .cast(fld.dataType)
        // file formats read nullable; a required table column needs the
        // claim tightened — AssertNotNull is non-nullable in the plan
        // AND throws (fails the load, nothing committed) on a real null
        val tight = if (fld.nullable) c else GraftBridge.column(
          org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
            GraftBridge.expression(c)))
        tight.as(fld.name)
      }: _*)
    }
    def readFile(f: String): DataFrame = format match {
      case "parquet" => spark.read.parquet(f)
      case "csv" => spark.read.option("header", "true").csv(f)
      case _ => spark.read.json(f)
    }
    // ledger pre-check: skip a recorded file without even reading it
    val loaded: String => Boolean = h match {
      case LogTable(base) =>
        val seen = GraftLog.commits(base).flatMap(_.txnId).toSet
        seen.contains _
      case DeltaTable(base) =>
        val seen =
          graft.sources.DeltaInterop.snapshot(spark, base).txnVersions
        seen.contains _
      case IceTable(base) =>
        id => graft.sources.IcebergInterop.lastBatchId(base, id) >= 1L
    }
    var nLoaded = 0L
    files.foreach { f =>
      // ledger id = the file's normalized absolute path. absNorm keeps
      // scheme-qualified paths (s3a://…) verbatim-scheme + segment-
      // normalized, so the id never depends on the driver's cwd — the
      // exactly-once guarantee must survive reloading from a different
      // working directory.
      val id = "copyinto:" + graft.sources.PathCodec.absNorm(f)
      if (!loaded(id)) {
        val batch = conform(readFile(f), f)
        h match {
          case LogTable(base) =>
            GraftLog.append(batch, base, txnId = Some(id))
          case DeltaTable(base) =>
            graft.sources.DeltaInterop.appendIdempotent(batch, base, id, 1L)
          case IceTable(base) =>
            // empty partitionBy inherits the table's spec, transforms
            // included (appendIdempotent's inherit/validate contract)
            graft.sources.IcebergInterop.appendIdempotent(batch, base, id, 1L)
        }
        nLoaded += 1
      }
    }
    refreshView(spark, name, h)
    import spark.implicits._
    Seq(("COPY INTO", nLoaded)).toDF("operation", "n_files_loaded")
  }

  // ------------------------------------------------------------- DDL

  private def ddlName(p: LogicalPlan): Option[String] = p match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
      Some(u.nameParts.last.toLowerCase)
    case u: UnresolvedTable => Some(u.multipartIdentifier.last.toLowerCase)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
      Some(u.multipartIdentifier.last.toLowerCase)
    case _ => None
  }

  /** `ALTER TABLE <t> RENAME TO <u>`: a path-based table IS its path —
    * renaming moves the REGISTRATION (handler + temp view), no file. */
  private def runRenameTable(spark: SparkSession, name: String,
                             newName: String): DataFrame = {
    require(!tablesOf(spark).containsKey(newName),
      s"'$newName' is already a registered table")
    val h = tablesOf(spark).remove(name)
    spark.catalog.dropTempView(name)
    val provider = h match {
      case LogTable(_) => "graftlog"
      case DeltaTable(_) => "delta"
      case IceTable(_) => "iceberg"
    }
    registerAs(spark, newName, provider, h.base)
    result(spark, "RENAME TABLE", -1L)
  }

  /** The USING provider, normalized — Some only for the three formats
    * this front-end owns; anything else (parquet, csv, ...) falls
    * through to Spark's own session catalog. */
  private def specProvider(spec: TableSpecBase): Option[String] = {
    val p = spec match {
      case ts: TableSpec => ts.provider
      case ts: UnresolvedTableSpec => ts.provider
      case _ => None
    }
    p.map(_.toLowerCase.replaceAll("[-_]", "")).collect {
      case n @ ("graftlog" | "delta" | "iceberg") => n
    }
  }

  private def specLocation(spec: TableSpecBase): Option[String] = spec match {
    case ts: TableSpec => ts.location
    case ts: UnresolvedTableSpec => ts.location
    case _ => None
  }

  private def specProperties(spec: TableSpecBase): Map[String, String] =
    spec match {
      case ts: TableSpec => ts.properties
      case ts: UnresolvedTableSpec => ts.properties
      case _ => Map.empty
    }

  /** PARTITIONED BY as plain top-level columns; transforms
    * (bucket/truncate/days) refuse toward the API writers. */
  private def identityCols(parts: Seq[
      org.apache.spark.sql.connector.expressions.Transform]): Seq[String] =
    parts.map { t =>
      if (t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1)
        t.references.head.fieldNames.head
      else throw new IllegalArgumentException(
        s"CREATE TABLE: only PARTITIONED BY plain columns is supported " +
        s"through SQL (got: ${t.describe}) — transformed specs use the " +
        "API writers (overwriteTransformed)")
    }

  /** PARTITIONED BY for ICEBERG tables: plain columns AND the spec's
    * transforms — `bucket(16, k)`, `truncate(4, s)`, `days(ts)` /
    * `years(ts)` / `months(ts)` / `hours(ts)` — parsed from the
    * connector Transform shapes Spark's DDL parser produces. This is
    * what makes SHOW CREATE TABLE on a transformed table round-trip
    * through this same front-end. */
  private def iceTransformSpec(parts: Seq[
      org.apache.spark.sql.connector.expressions.Transform])
      : Seq[(String, graft.sources.IcebergInterop.IceTransform)] = {
    import graft.sources.IcebergInterop.IceTransform
    def ref(t: org.apache.spark.sql.connector.expressions.Transform): String = {
      require(t.references.length == 1 &&
        t.references.head.fieldNames.length == 1,
        s"PARTITIONED BY: unsupported partition reference ${t.describe}")
      t.references.head.fieldNames.head
    }
    def intArg(t: org.apache.spark.sql.connector.expressions.Transform): Int =
      t.arguments.collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          l.value match {
            case i: java.lang.Integer => i.intValue
            case n: java.lang.Long => n.intValue
            case other => throw new IllegalArgumentException(
              s"PARTITIONED BY: ${t.name} needs an integer argument, " +
              s"got $other")
          }
      }.getOrElse(throw new IllegalArgumentException(
        s"PARTITIONED BY: ${t.name} needs an integer argument " +
        s"(got: ${t.describe})"))
    parts.map { t =>
      t.name match {
        case "identity" => ref(t) -> (IceTransform.Identity: IceTransform)
        case "bucket" => ref(t) -> IceTransform.Bucket(intArg(t))
        case "truncate" => ref(t) -> IceTransform.Truncate(intArg(t))
        case "days" | "day" => ref(t) -> (IceTransform.Day: IceTransform)
        case "years" | "year" => ref(t) -> (IceTransform.Year: IceTransform)
        case "months" | "month" => ref(t) -> (IceTransform.Month: IceTransform)
        case "hours" | "hour" => ref(t) -> (IceTransform.Hour: IceTransform)
        case other => throw new IllegalArgumentException(
          s"PARTITIONED BY: unsupported Iceberg transform '$other' " +
          s"(${t.describe}) — have identity/bucket/truncate/" +
          "days/years/months/hours")
      }
    }
  }

  /** The SQL rendering of one Iceberg spec field — the inverse of
    * `iceTransformSpec`, used by SHOW CREATE TABLE. */
  private def renderIceSpecField(
      f: graft.sources.IcebergInterop.SpecField, src: String): String =
    f.transform match {
      case "identity" => src
      case b if b.startsWith("bucket[") =>
        s"bucket(${b.stripPrefix("bucket[").stripSuffix("]")}, $src)"
      case t if t.startsWith("truncate[") =>
        s"truncate(${t.stripPrefix("truncate[").stripSuffix("]")}, $src)"
      case "day" => s"days($src)"
      case "year" => s"years($src)"
      case "month" => s"months($src)"
      case "hour" => s"hours($src)"
      case other => throw new IllegalArgumentException(
        s"SHOW CREATE TABLE: no DDL rendering for Iceberg transform " +
        s"'$other' on '$src'")
    }

  private def tableExistsAt(provider: String, base: String): Boolean =
    provider match {
      case "graftlog" => graft.sources.TableIO().exists(
        graft.sources.TableIO.join(base, "_graft_log"))
      case "delta" => graft.sources.TableIO().exists(
        graft.sources.TableIO.join(base, "_delta_log"))
      case "iceberg" => graft.sources.TableIO().exists(
        graft.sources.TableIO.join(base, "metadata/version-hint.text"))
      case _ => false
    }

  private def emptyFrame(spark: SparkSession,
                         schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)

  private def registerAs(spark: SparkSession, name: String,
                         provider: String, base: String): Unit =
    provider match {
      case "graftlog" => registerTable(spark, name, base)
      case "delta" => registerDeltaTable(spark, name, base)
      case "iceberg" => registerIcebergTable(spark, name, base)
    }

  /** Shared CREATE/CTAS body: write `df` (possibly empty) as the new
    * table at LOCATION and register it under `name`. Path-based
    * engine: LOCATION is required. `IF NOT EXISTS` on an existing
    * table registers it and leaves the data alone (no-op create);
    * without it, an existing table refuses. Table PROPERTIES carry
    * into Delta's configuration; the other formats have no property
    * store and refuse rather than silently dropping them. */
  private def createAt(spark: SparkSession, name: String, provider: String,
                       spec: TableSpecBase,
                       partitioning: Seq[
                         org.apache.spark.sql.connector.expressions.Transform],
                       ignoreIfExists: Boolean,
                       df: DataFrame,
                       generated: Seq[(String,
                         org.apache.spark.sql.types.DataType, String)] =
                         Seq.empty,
                       identity: Option[(String, Long, Long)] = None)
      : DataFrame = {
    val base = specLocation(spec).getOrElse(throw new IllegalArgumentException(
      s"CREATE TABLE $name USING $provider needs LOCATION '<path>' — " +
      "this front-end manages path-based tables"))
    val props = specProperties(spec)
    require(props.isEmpty || provider == "delta",
      s"TBLPROPERTIES are supported on Delta tables only (got " +
      s"${props.keys.mkString(",")} for $provider)")
    // CLUSTER BY parses into the partitioning list as its own
    // transform — split it out: it is Delta liquid clustering, not a
    // partition spec
    val clusterCols: Seq[String] = partitioning.collect {
      case c: org.apache.spark.sql.connector.expressions.ClusterByTransform =>
        c.columnNames.toSeq.map(_.fieldNames().mkString("."))
    }.flatten
    val parting = partitioning.filterNot(_.isInstanceOf[
      org.apache.spark.sql.connector.expressions.ClusterByTransform])
    require(clusterCols.isEmpty || provider == "delta",
      "CLUSTER BY is Delta liquid clustering — the other providers " +
      "take PARTITIONED BY (or the clustered writers)")
    // Iceberg accepts the full transform grammar; the other providers
    // take plain columns only (identityCols refuses with guidance)
    val iceSpec = if (provider == "iceberg") iceTransformSpec(parting)
                  else Seq.empty
    val partCols = if (provider == "iceberg") iceSpec.map(_._1)
                   else identityCols(parting)
    require(partCols.isEmpty || provider != "graftlog",
      "graft-log tables do not partition by directory — use the " +
      "clustered writers (overwriteClustered) for layout control")
    partCols.foreach(c => require(df.columns.contains(c),
      s"PARTITIONED BY column '$c' is not in the table schema " +
      s"(${df.columns.mkString(",")})"))
    if (tableExistsAt(provider, base)) {
      if (!ignoreIfExists) throw new IllegalArgumentException(
        s"table already exists at $base (use CREATE TABLE IF NOT EXISTS " +
        "to register it instead)")
      registerAs(spark, name, provider, base)
      return result(spark, "CREATE TABLE", -1L)
    }
    val v = provider match {
      case "graftlog" =>
        if (df.isStreaming) throw new IllegalArgumentException(
          "streaming CTAS is not supported")
        // data-free create = one schema-only commit; CTAS stages rows
        if (GraftBridge.logicalPlan(df).isInstanceOf[LocalRelation] &&
            df.isEmpty)
          GraftLog.commit(base, "create", Seq.empty, Seq.empty,
            schemaJson = Some(df.schema.json))
        else GraftLog.overwrite(df, base)
      case "delta" =>
        if (identity.isDefined) {
          val (n, st, sp) = identity.get
          graft.sources.DeltaInterop.overwriteIdentity(df, base, n, st, sp,
            partCols, props)
        } else if (generated.nonEmpty)
          graft.sources.DeltaInterop.overwriteGenerated(df, base,
            generated, partCols, props)
        else graft.sources.DeltaInterop.overwrite(df, base,
          partitionBy = partCols, configuration = props)
      case "iceberg" =>
        graft.sources.IcebergInterop.overwriteTransformed(df, base, iceSpec)
    }
    val v2 =
      if (clusterCols.isEmpty) v
      else graft.sources.DeltaInterop.enableClustering(spark, base,
        clusterCols)
    registerAs(spark, name, provider, base)
    result(spark, "CREATE TABLE", v2)
  }

  private def schemaOf(spark: SparkSession,
                       columns: Seq[ColumnDefinition], stmt: String)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StructField, StructType}
    StructType(columns.map { cd =>
      require(cd.defaultValue.isEmpty && cd.generationExpression.isEmpty &&
        cd.identityColumnSpec.isEmpty,
        s"$stmt: column '${cd.name}' uses DEFAULT/GENERATED/" +
        "IDENTITY, which this front-end does not support")
      StructField(cd.name, cd.dataType, cd.nullable)
    })
  }

  /** `ALTER TABLE ... CLUSTER BY (cols)`: switch a Delta table to
    * liquid clustering, or change its clustering columns (every file
    * clustered under the old columns re-clusters at the next
    * OPTIMIZE). */
  private def runClusterBy(spark: SparkSession, name: String,
      spec: Option[org.apache.spark.sql.catalyst.catalog.ClusterBySpec])
      : DataFrame = {
    val h = tablesOf(spark).get(name)
    h match {
      case DeltaTable(base) =>
        // CLUSTER BY NONE parses as an absent spec: metadata-only
        // domain tombstone, the table goes back to bin-pack OPTIMIZE
        val v = spec match {
          case None => graft.sources.DeltaInterop
            .disableClustering(spark, base)
          case Some(s) => graft.sources.DeltaInterop.enableClustering(
            spark, base,
            s.columnNames.map(_.fieldNames().mkString(".")).toSeq)
        }
        refreshView(spark, name, h)
        result(spark, "CLUSTER BY", v)
      case _ => throw new IllegalArgumentException(
        s"ALTER TABLE $name CLUSTER BY: liquid clustering is a Delta " +
        "feature (graft-log has overwriteClustered; Iceberg has sort " +
        "orders via rewrite)")
    }
  }

  private def runCreateTable(spark: SparkSession, name: String,
                             provider: String, c: CreateTable): DataFrame = {
    // GENERATED ALWAYS AS (expr) and GENERATED ALWAYS AS IDENTITY:
    // recorded + enforced on Delta only (field-metadata features)
    val (genCols, rest) =
      c.columns.partition(_.generationExpression.isDefined)
    val (idCols, plainCols) = rest.partition(_.identityColumnSpec.isDefined)
    require((genCols.isEmpty && idCols.isEmpty) || provider == "delta",
      "GENERATED columns (expression or IDENTITY) are supported on " +
      "Delta tables only")
    require(idCols.size <= 1, "at most one IDENTITY column per table")
    require(genCols.isEmpty || idCols.isEmpty,
      "a table with both expression-generated and IDENTITY columns is " +
      "not supported")
    val generated = genCols.map { cd =>
      require(cd.defaultValue.isEmpty && cd.identityColumnSpec.isEmpty,
        s"column '${cd.name}' mixes GENERATED with DEFAULT/IDENTITY")
      (cd.name, cd.dataType, cd.generationExpression.get)
    }
    val identity = idCols.headOption.map { cd =>
      val spec = cd.identityColumnSpec.get
      require(!spec.isAllowExplicitInsert,
        "GENERATED BY DEFAULT AS IDENTITY is not supported — ALWAYS " +
        "only (explicit inserts would bypass the high-water mark)")
      require(cd.dataType == org.apache.spark.sql.types.LongType,
        s"IDENTITY column '${cd.name}' must be BIGINT")
      (cd.name, spec.getStart, spec.getStep)
    }
    createAt(spark, name, provider, c.tableSpec, c.partitioning,
      c.ignoreIfExists,
      emptyFrame(spark, schemaOf(spark, plainCols, "CREATE TABLE")),
      generated, identity)
  }

  private def runCtas(spark: SparkSession, name: String, provider: String,
                      c: CreateTableAsSelect): DataFrame =
    createAt(spark, name, provider, c.tableSpec, c.partitioning,
      c.ignoreIfExists, GraftBridge.ofRows(spark, c.query))

  /** `[CREATE OR] REPLACE TABLE`: the table DEFINITION is replaced —
    * new schema, partitioning and (Delta) properties take effect in one
    * commit that removes every live file — while the log/history
    * continues (old snapshots stay time-travelable, the Delta table id
    * carries forward). Plain REPLACE on a missing table refuses;
    * `OR CREATE` falls back to a create. */
  private def replaceAt(spark: SparkSession, name: String, provider: String,
                        spec: TableSpecBase,
                        partitioning: Seq[
                          org.apache.spark.sql.connector.expressions.Transform],
                        orCreate: Boolean,
                        df: DataFrame): DataFrame = {
    val base = specLocation(spec).getOrElse(throw new IllegalArgumentException(
      s"REPLACE TABLE $name USING $provider needs LOCATION '<path>' — " +
      "this front-end manages path-based tables"))
    if (!tableExistsAt(provider, base)) {
      if (!orCreate) throw new IllegalArgumentException(
        s"REPLACE TABLE: no $provider table at $base (use CREATE OR " +
        "REPLACE to create it)")
      return createAt(spark, name, provider, spec, partitioning,
        ignoreIfExists = false, df)
    }
    val props = specProperties(spec)
    require(props.isEmpty || provider == "delta",
      s"TBLPROPERTIES are supported on Delta tables only (got " +
      s"${props.keys.mkString(",")} for $provider)")
    val iceSpec = if (provider == "iceberg") iceTransformSpec(partitioning)
                  else Seq.empty
    val partCols = if (provider == "iceberg") iceSpec.map(_._1)
                   else identityCols(partitioning)
    require(partCols.isEmpty || provider != "graftlog",
      "graft-log tables do not partition by directory — use the " +
      "clustered writers (overwriteClustered) for layout control")
    partCols.foreach(c => require(df.columns.contains(c),
      s"PARTITIONED BY column '$c' is not in the table schema " +
      s"(${df.columns.mkString(",")})"))
    val v = provider match {
      case "graftlog" =>
        GraftLog.overwrite(df, base) // log continues; history preserved
      case "delta" =>
        val tableId =
          graft.sources.DeltaInterop.snapshot(spark, base).tableId
        graft.sources.DeltaInterop.overwrite(df, base,
          partitionBy = partCols, configuration = props, tableId = tableId)
      case "iceberg" =>
        graft.sources.IcebergInterop.overwriteTransformed(df, base, iceSpec)
    }
    registerAs(spark, name, provider, base)
    result(spark, "REPLACE TABLE", v)
  }

  private def runReplaceTable(spark: SparkSession, name: String,
                              provider: String, r: ReplaceTable): DataFrame =
    replaceAt(spark, name, provider, r.tableSpec, r.partitioning,
      r.orCreate,
      emptyFrame(spark, schemaOf(spark, r.columns, "REPLACE TABLE")))

  private def runReplaceCtas(spark: SparkSession, name: String,
                             provider: String,
                             r: ReplaceTableAsSelect): DataFrame =
    replaceAt(spark, name, provider, r.tableSpec, r.partitioning,
      r.orCreate, GraftBridge.ofRows(spark, r.query))

  /** DROP TABLE unregisters the SQL name and drops the temp view; the
    * files at LOCATION survive (external-table semantics — the path is
    * the table). `PURGE` additionally deletes the directory. */
  private def runDrop(spark: SparkSession, name: String,
                      d: DropTable): DataFrame = {
    val h = tablesOf(spark).remove(name)
    spark.catalog.dropTempView(name)
    if (d.purge)
      graft.sources.TableIO().deleteRecursively(h.base)
    result(spark, if (d.purge) "DROP TABLE PURGE" else "DROP TABLE", -1L)
  }

  /** TRUNCATE TABLE: one commit emptying the CONTENTS while the
    * definition (schema, partitioning, properties, table id) carries
    * forward — the same definition-preserving overwrite INSERT
    * OVERWRITE uses, with an empty source. */
  private def runTruncate(spark: SparkSession, name: String): DataFrame = {
    val h = tablesOf(spark).get(name)
    val v = h match {
      case LogTable(base) =>
        GraftLog.overwrite(emptyFrame(spark, spark.table(name).schema), base)
      case DeltaTable(base) =>
        // the SNAPSHOT schema carries field metadata (generation
        // expressions, identity marks) a view schema might not —
        // truncating must not strip those from the definition
        val snap = graft.sources.DeltaInterop.snapshot(spark, base)
        graft.sources.DeltaInterop.overwrite(
          emptyFrame(spark, snap.schema), base,
          partitionBy = snap.partitionColumns,
          configuration = snap.configuration,
          tableId = snap.tableId)
      case IceTable(base) =>
        graft.sources.IcebergInterop.overwriteTransformed(
          emptyFrame(spark, spark.table(name).schema), base,
          graft.sources.IcebergInterop.tableSpec(spark, base))
    }
    refreshView(spark, name, h)
    result(spark, "TRUNCATE TABLE", v)
  }

  /** `ALTER TABLE <t> RENAME COLUMN a TO b`: O(1) metadata on the
    * formats whose resolution survives it (Delta under column mapping
    * — ids+physicalName unchanged; Iceberg by field id), an HONEST
    * copy-on-write rewrite on graft-log (name-resolved format, no ids
    * to hide behind — `GraftLog.renameColumnRewrite`'s scaladoc has
    * the full hazard analysis). Nested paths refuse. */
  private def runRenameColumn(spark: SparkSession, name: String,
                              path: Seq[String], newName: String): DataFrame = {
    require(path.length == 1,
      s"RENAME COLUMN: nested field '${path.mkString(".")}' is not " +
      "supported — only top-level columns")
    val h = tablesOf(spark).get(name)
    val v = h match {
      case LogTable(base) =>
        GraftLog.renameColumnRewrite(spark, base, path.head, newName)
      case DeltaTable(base) =>
        graft.sources.DeltaInterop.renameColumn(spark, base, path.head, newName)
      case IceTable(base) =>
        graft.sources.IcebergInterop.renameColumn(base, path.head, newName)
    }
    refreshView(spark, name, h)
    result(spark, "RENAME COLUMN", v)
  }

  /** `ALTER TABLE <t> ALTER COLUMN <c> TYPE <T>`: the same legal
    * promotions on every format (int→long, float→double, decimal
    * precision widening) — Iceberg and Delta as O(1) metadata (field-id
    * resolution / the typeWidening table feature; old files keep their
    * narrower physical type and read through the wider one), graft-log
    * as an honest copy-on-write cast rewrite. Only the TYPE change is
    * served — comment / position / nullability alterations refuse
    * rather than silently no-op. */
  private def runAlterColumnType(spark: SparkSession, name: String,
                                 specs: Seq[AlterColumnSpec]): DataFrame = {
    val h = tablesOf(spark).get(name)
    require(specs.nonEmpty, "ALTER COLUMN: no alterations given")
    val v = specs.map { s =>
      require(s.newDataType.isDefined &&
          s.newNullability.isEmpty && s.newComment.isEmpty &&
          s.newPosition.isEmpty && s.newDefaultExpression.isEmpty &&
          !s.dropDefault,
        "ALTER COLUMN: only TYPE <newType> is supported here")
      require(s.column.name.length == 1,
        s"ALTER COLUMN: nested field '${s.column.name.mkString(".")}' " +
        "is not supported — only top-level columns")
      val colName = s.column.name.head
      val to = s.newDataType.get
      h match {
        case LogTable(base) =>
          GraftLog.promoteColumnRewrite(spark, base, colName, to)
        case IceTable(base) =>
          graft.sources.IcebergInterop.promoteColumnType(base, colName, to)
        case DeltaTable(base) =>
          graft.sources.DeltaInterop.widenColumnType(spark, base, colName, to)
      }
    }.last
    refreshView(spark, name, h)
    result(spark, "ALTER COLUMN TYPE", v)
  }

  /** `ALTER TABLE <t> DROP COLUMN[S] ...`: metadata-only narrowing on
    * Delta (column mapping required — fresh ids make a later re-ADD
    * safe) and Iceberg (field-id retirement), copy-on-write rewrite on
    * graft-log. IF EXISTS filters to the columns actually present. */
  private def runDropColumns(spark: SparkSession, name: String,
                             paths: Seq[Seq[String]],
                             ifExists: Boolean): DataFrame = {
    paths.foreach(p => require(p.length == 1,
      s"DROP COLUMNS: nested field '${p.mkString(".")}' is not " +
      "supported — only top-level columns"))
    val h = tablesOf(spark).get(name)
    val have = spark.table(name).columns.toSet
    val cols = paths.map(_.head).filter(c => !ifExists || have.contains(c))
    if (cols.isEmpty) return result(spark, "DROP COLUMNS", -1L)
    val v = h match {
      case LogTable(base) =>
        GraftLog.dropColumnsRewrite(spark, base, cols)
      case DeltaTable(base) =>
        graft.sources.DeltaInterop.dropColumns(spark, base, cols)
      case IceTable(base) =>
        cols.map(c =>
          graft.sources.IcebergInterop.dropColumn(spark, base, c)).last
    }
    refreshView(spark, name, h)
    result(spark, "DROP COLUMNS", v)
  }

  /** `ALTER TABLE <t> SET TBLPROPERTIES (...)`: Delta tables merge the
    * properties into metaData.configuration —
    * `'delta.columnMapping.mode'='name'` routes through the proper
    * mapping UPGRADE (ids + physicalNames assigned, protocol raised),
    * which is what unlocks RENAME/DROP COLUMN there. graft-log and
    * Iceberg tables have no property store here and refuse rather than
    * silently dropping the assignment. */
  private def runSetProperties(spark: SparkSession, name: String,
                               props: Map[String, String]): DataFrame = {
    val h = tablesOf(spark).get(name)
    val v = h match {
      case DeltaTable(base) =>
        val mappingReq = props.get("delta.columnMapping.mode")
        mappingReq.foreach(m => require(m == "name",
          s"delta.columnMapping.mode '$m' is not an upgrade target " +
          "(mode 'id' needs parquet field ids pre-upgrade files lack)"))
        // row tracking is an UPGRADE, not a property flip: enablement
        // must backfill baseRowIds, raise the protocol and write the
        // high-water-mark domain — a bare property would leave every
        // write refusing on the half-state
        val rowTrackReq = props.get("delta.enableRowTracking")
        rowTrackReq.foreach(rt => require(rt.equalsIgnoreCase("true"),
          "disabling row tracking is not implemented — readers may " +
          "depend on the ids; drop and rewrite the table instead"))
        props.keys.find(_.startsWith("delta.rowTracking.")).foreach(k =>
          throw new IllegalArgumentException(
            s"'$k' is engine-managed (set by the row-tracking upgrade) " +
            "— setting it directly would corrupt id resolution"))
        // in-commit timestamps are likewise an UPGRADE: the enablement
        // commit must raise the protocol, stamp the first ICT and
        // record the enablement version — a bare property flip would
        // leave commits without the timestamps the property promises
        val ictReq = props.get("delta.enableInCommitTimestamps")
        ictReq.foreach(v => require(v.equalsIgnoreCase("true"),
          "disabling in-commit timestamps is not implemented — " +
          "timestamp time travel may depend on them"))
        val rest = props - "delta.columnMapping.mode" -
          "delta.enableRowTracking" - "delta.enableInCommitTimestamps"
        val v1 =
          if (mappingReq.isDefined)
            graft.sources.DeltaInterop.enableColumnMapping(spark, base)
          else -1L
        val v2 =
          if (rowTrackReq.isDefined)
            graft.sources.DeltaInterop.enableRowTracking(spark, base)
          else v1
        val v3 =
          if (ictReq.isDefined)
            graft.sources.DeltaInterop.enableInCommitTimestamps(spark, base)
          else v2
        if (rest.nonEmpty)
          graft.sources.DeltaInterop.setProperties(spark, base, rest)
        else v3
      case IceTable(base) =>
        // the one Iceberg property with table-changing semantics here:
        // 'format-version' upgrades route through the metadata commit
        // (v2 → v3 unlocks deletion-vector deletes); anything else has
        // no property store in this engine and refuses
        require(props.keySet == Set("format-version"),
          "Iceberg SET TBLPROPERTIES supports 'format-version' only " +
          s"(got ${props.keys.mkString(", ")})")
        graft.sources.IcebergInterop.upgradeFormatVersion(base,
          props("format-version").trim.toInt)
      case other => throw new IllegalArgumentException(
        s"SET TBLPROPERTIES is supported on Delta and Iceberg tables " +
        s"only (${other.getClass.getSimpleName.stripSuffix("$")} has no " +
        "property store)")
    }
    refreshView(spark, name, h)
    result(spark, "SET TBLPROPERTIES", v)
  }

  /** `ALTER TABLE <t> ADD CONSTRAINT <name> CHECK (<cond>)`: Delta
    * tables record the condition (`delta.constraints.*`) after probing
    * that EXISTING rows satisfy it; every later write validates its
    * post-image. Only CHECK constraints are enforceable at write time
    * on a data lake — PRIMARY KEY/UNIQUE/FOREIGN KEY would need a
    * global index and refuse. graft-log/Iceberg have no constraint
    * store and refuse toward `graft.pipeline.Quality` expectations. */
  private def runAddConstraint(spark: SparkSession, name: String,
                               constraint: org.apache.spark.sql.catalyst
                                 .expressions.TableConstraint): DataFrame = {
    val h = tablesOf(spark).get(name)
    val check = constraint match {
      case c: org.apache.spark.sql.catalyst.expressions.CheckConstraint => c
      case other => throw new IllegalArgumentException(
        s"only CHECK constraints are enforceable at write time " +
        s"(got ${other.getClass.getSimpleName}) — PRIMARY KEY/UNIQUE/" +
        "FOREIGN KEY would need a global index")
    }
    require(check.userProvidedName != null,
      "ADD CONSTRAINT needs an explicit name (DROP CONSTRAINT " +
      "addresses it by name)")
    val v = h match {
      case DeltaTable(base) =>
        graft.sources.DeltaInterop.addCheckConstraint(spark, base,
          check.userProvidedName, check.condition)
      case other => throw new IllegalArgumentException(
        s"CHECK constraints are recorded on Delta tables only " +
        s"(${other.getClass.getSimpleName.stripSuffix("$")} has no " +
        "constraint store) — data-quality gates for the other formats " +
        "live in graft.pipeline.Quality")
    }
    result(spark, "ADD CONSTRAINT", v)
  }

  private def runDropConstraint(spark: SparkSession, name: String,
                                cname: String, ifExists: Boolean,
                                cascade: Boolean): DataFrame = {
    require(!cascade, "DROP CONSTRAINT CASCADE is not supported")
    val h = tablesOf(spark).get(name)
    val v = h match {
      case DeltaTable(base) =>
        graft.sources.DeltaInterop.dropCheckConstraint(spark, base,
          cname, ifExists)
      case other => throw new IllegalArgumentException(
        s"CHECK constraints are recorded on Delta tables only")
    }
    result(spark, "DROP CONSTRAINT", v)
  }

  /** `ALTER TABLE <t> ADD COLUMNS (c1 T1, ...)` on a registered table:
    * metadata-only schema evolution on every format (graft-log widened
    * schemaJson commit, Delta metaData action, Iceberg new schema-id
    * with fresh field ids) — no data file is touched, existing rows
    * read the new columns as NULL. Nested paths, positions
    * (FIRST/AFTER), DEFAULT values and NOT NULL refuse loudly: a
    * non-null column with no backfill would be a lie, and the formats'
    * O(1)-evolution contract is top-level append-at-end. */
  private def runAddColumns(spark: SparkSession, name: String,
                            cols: Seq[QualifiedColType]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val h = tablesOf(spark).get(name)
    cols.foreach { c =>
      require(c.path.isEmpty,
        s"ADD COLUMNS: nested column '${c.name.mkString(".")}' is not " +
        "supported — only top-level columns")
      require(c.position.isEmpty,
        "ADD COLUMNS: FIRST/AFTER positions are not supported — new " +
        "columns append at the end")
      require(c.default.isEmpty || h.isInstanceOf[IceTable],
        "ADD COLUMNS: DEFAULT values are an Iceberg v3 feature here — " +
        "on this format existing rows read new columns as NULL")
      require(c.nullable,
        s"ADD COLUMNS: '${c.colName}' NOT NULL is not supported — a " +
        "non-null column with no backfill would be unreadable")
    }
    // a DEFAULT is a row-independent constant: evaluate it through a
    // one-row projection (the asOfMillis shape) — column references
    // fail loudly in analysis, exactly as SQL requires
    def evalDefault(e: Expression, dt: org.apache.spark.sql.types.DataType): Any = {
      val row = GraftBridge.ofRows(spark,
        Project(Seq(org.apache.spark.sql.catalyst.expressions.Alias(
          org.apache.spark.sql.catalyst.expressions.Cast(e, dt),
          "__graft_default")()), OneRowRelation())).head()
      require(!row.isNullAt(0), s"DEFAULT evaluated to NULL: ${e.sql}")
      row.get(0)
    }
    val st = StructType(cols.map(c =>
      StructField(c.colName, c.dataType, nullable = true)))
    val v = h match {
      case LogTable(base) => GraftLog.addColumns(base, st)
      case DeltaTable(base) =>
        graft.sources.DeltaInterop.addColumns(spark, base, st)
      case IceTable(base) =>
        cols.map(c =>
          graft.sources.IcebergInterop.addColumn(base, c.colName, c.dataType,
            default = c.default.map(d => evalDefault(d.child, c.dataType))))
          .last
    }
    refreshView(spark, name, h)
    result(spark, "ADD COLUMNS", v)
  }

  /** SELECTs carrying `VERSION AS OF` / `TIMESTAMP AS OF` over
    * registered tables: each `RelationTimeTravel` node (including
    * inside subqueries) is substituted with the format's as-of read —
    * the same file-pruned snapshot scan the API path produces — and the
    * rewritten plan executes as a normal query. Time travel over
    * UNregistered relations falls back to `spark.sql` (None), which
    * raises Spark's own unsupported-relation error. */
  private def runTimeTravel(spark: SparkSession,
                            plan: LogicalPlan): Option[DataFrame] = {
    var rewrote = false
    val rewritten = plan.transformDownWithSubqueries {
      case tt @ RelationTimeTravel(r: UnresolvedRelation, ts, ver) =>
        val h = tablesOf(spark).get(r.multipartIdentifier.last.toLowerCase)
        if (h == null) tt
        else {
          rewrote = true
          GraftBridge.logicalPlan(resolveAsOf(spark, h, ts, ver))
        }
    }
    if (rewrote) Some(GraftBridge.ofRows(spark, rewritten)) else None
  }

  /** `TIMESTAMP AS OF <expr>` → epoch millis. The expression arrives
    * UNRESOLVED (it may be `timestamp_millis(...)`, `current_date -
    * interval ...`, any row-independent expression), so it is analyzed
    * and evaluated through a one-row projection — expressions
    * referencing columns fail loudly in analysis, exactly as Spark's
    * own time travel requires a constant. */
  private def asOfMillis(spark: SparkSession, e: Expression): Long = {
    val row = GraftBridge.ofRows(spark,
      Project(Seq(org.apache.spark.sql.catalyst.expressions.Alias(
        org.apache.spark.sql.catalyst.expressions.Cast(
          e, org.apache.spark.sql.types.TimestampType), "__graft_asof")()),
        OneRowRelation())).head()
    require(!row.isNullAt(0),
      s"TIMESTAMP AS OF evaluated to NULL: ${e.sql}")
    row.getAs[java.sql.Timestamp](0).getTime
  }

  private def resolveAsOf(spark: SparkSession, h: Handler,
                          ts: Option[Expression],
                          ver: Option[String]): DataFrame = {
    // a non-numeric VERSION AS OF names an Iceberg ref (tag/branch)
    val isRef = ver.exists(v => !v.forall(_.isDigit))
    require(!isRef || h.isInstanceOf[IceTable],
      s"VERSION AS OF '${ver.get}': named refs (tags/branches) are an " +
      "Iceberg feature — graft-log and Delta travel by numeric version")
    val version = ver.filterNot(_ => isRef).map(_.toLong)
    val millis = ts.map(asOfMillis(spark, _))
    h match {
      case LogTable(base) =>
        GraftLog.read(spark, base, version, millis)
      case DeltaTable(base) =>
        graft.sources.DeltaInterop.read(spark, base,
          versionAsOf = version, timestampAsOf = millis)
      case IceTable(base) =>
        (version, millis) match {
          case _ if isRef =>
            graft.sources.IcebergInterop.readRef(spark, base, ver.get)
          case (Some(sid), _) =>
            graft.sources.IcebergInterop.read(spark, base, Some(sid))
          case (None, Some(ms)) =>
            graft.sources.IcebergInterop.readAsOfTimestamp(spark, base, ms)
          case (None, None) =>
            graft.sources.IcebergInterop.read(spark, base)
        }
    }
  }

  private def runInsert(spark: SparkSession, name: String,
                        i: InsertIntoStatement): DataFrame = {
    require(i.partitionSpec.isEmpty,
      "INSERT with PARTITION is not supported — " +
      "INSERT [OVERWRITE] <table> SELECT full rows")
    val h = tablesOf(spark).get(name)
    // SQL INSERT conforms to the TABLE's schema (names + implicit
    // casts): the raw format appends don't validate shape, so a
    // mismatched SELECT would otherwise silently write files other
    // readers resolve as nulls (or silently evolve graft-log's schema)
    val table = spark.table(name)
    val raw0 = GraftBridge.ofRows(spark, i.query)
    // Delta GENERATED columns (expression or IDENTITY) may be omitted
    // — the write path derives/assigns them (and for expressions,
    // validates them when provided)
    val generatedCols: Set[String] = h match {
      case DeltaTable(base) =>
        val snap = graft.sources.DeltaInterop.snapshot(spark, base)
        graft.sources.DeltaInterop.generatedColumnsOf(snap.schema)
          .map(_._1).toSet ++
          graft.sources.DeltaInterop.identityColumnOf(snap.schema)
            .map(_._1).toSet
      case _ => Set.empty
    }
    // `INSERT INTO t (a, c) SELECT ...`: the SELECT's outputs bind to
    // the NAMED columns POSITIONALLY (SQL's rule); every unnamed table
    // column reads NULL (generated/identity columns are omitted instead
    // — the write path derives them, and a NULL would refuse there)
    val raw = if (i.userSpecifiedCols.isEmpty) raw0 else {
      val names = i.userSpecifiedCols.map(_.toLowerCase)
      val tcols = table.columns.map(_.toLowerCase).toSet
      require(names.distinct == names && names.forall(tcols.contains),
        s"INSERT column list (${names.mkString(",")}) must be distinct " +
        s"table columns (${table.columns.mkString(",")})")
      require(raw0.columns.length == names.length,
        s"INSERT column list names ${names.length} columns but the " +
        s"SELECT produces ${raw0.columns.length}")
      // positional binding via index placeholders: a SELECT output may
      // be named `20.0` or carry dots — name-based col() would misparse
      val safe = raw0.toDF(names.indices.map(i => s"__ins_$i"): _*)
      val slotByName = names.zipWithIndex.toMap
      safe.select(table.schema.fields.flatMap { f =>
        slotByName.get(f.name.toLowerCase) match {
          case Some(i) => Some(org.apache.spark.sql.functions
            .col(s"__ins_$i").as(f.name))
          case None if generatedCols.contains(f.name) => None // derived
          case None => Some(org.apache.spark.sql.functions.lit(null)
            .cast(f.dataType).as(f.name))
        }
      }: _*)
    }
    require(raw.columns.toSet == table.columns.toSet ||
      raw.columns.toSet == table.columns.toSet -- generatedCols,
      s"INSERT source must carry exactly the table columns " +
      s"(${table.columns.mkString(",")}" +
      (if (generatedCols.isEmpty) ""
       else s"; generated ${generatedCols.mkString(",")} may be omitted") +
      s"), got (${raw.columns.mkString(",")})")
    val source = raw.select(table.schema.fields
      .filter(f => raw.columns.contains(f.name)).map(f =>
        org.apache.spark.sql.functions.col(f.name)
          .cast(f.dataType).as(f.name)): _*)
    val v = (h, i.overwrite) match {
      case (LogTable(base), false) => GraftLog.append(source, base)
      case (LogTable(base), true) => GraftLog.overwrite(source, base)
      case (DeltaTable(base), false) =>
        graft.sources.DeltaInterop.append(source, base)
      case (DeltaTable(base), true) =>
        // SQL INSERT OVERWRITE replaces the table's CONTENTS, never its
        // definition: the current partitioning, table properties (e.g.
        // delta.enableChangeDataFeed — downstream CDF consumers break if
        // it silently drops), table id, and SCHEMA FIELD METADATA
        // (generation expressions) all carry forward. New data lands
        // under the existing partition layout. Column-mapped tables
        // refuse: their contents live under physical names whose
        // mapping an overwrite-through-the-logical-view would corrupt.
        val snap = graft.sources.DeltaInterop.snapshot(spark, base)
        require(snap.columnMappingMode == "none",
          "INSERT OVERWRITE on a column-mapped Delta table is not " +
          "supported — use DeltaInterop.overwriteColumnMapped or " +
          "DELETE + INSERT")
        require(
          graft.sources.DeltaInterop.identityColumnOf(snap.schema).isEmpty,
          "INSERT OVERWRITE on an identity table is not supported — " +
          "replacing contents would orphan the high-water mark " +
          "(TRUNCATE + INSERT, or DELETE + INSERT)")
        val withGen = graft.sources.DeltaInterop.applyGeneratedColumns(
          snap.schema, source, "INSERT OVERWRITE")
        val withMeta = withGen.select(snap.schema.fields.map(f =>
          org.apache.spark.sql.functions.col(f.name)
            .as(f.name, f.metadata)): _*)
        graft.sources.DeltaInterop.overwrite(withMeta, base,
          partitionBy = snap.partitionColumns,
          configuration = snap.configuration,
          tableId = snap.tableId)
      case (IceTable(base), false) =>
        // empty partitionBy inherits the table's spec, transforms incl.
        graft.sources.IcebergInterop.append(source, base)
      case (IceTable(base), true) =>
        graft.sources.IcebergInterop.overwriteTransformed(source, base,
          graft.sources.IcebergInterop.tableSpec(spark, base))
    }
    refreshView(spark, name, h)
    result(spark, if (i.overwrite) "INSERT OVERWRITE" else "INSERT", v)
  }

  private def tableName(plan: LogicalPlan): Option[String] = plan match {
    case r: UnresolvedRelation => Some(r.multipartIdentifier.last.toLowerCase)
    case SubqueryAlias(_, child) => tableName(child)
    case _ => None
  }

  /** The alias a statement gave its target/source relation, if any. */
  private def aliasOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  /** SQL conditions arrive as unresolved trees with possibly-qualified
    * attributes (`t.k`); the table frame has no such qualifier, so
    * multi-part names collapse to their column name. */
  private def unqualify(e: Expression): Expression = e.transformUp {
    case a: UnresolvedAttribute if a.nameParts.length > 1 =>
      UnresolvedAttribute(Seq(a.nameParts.last))
  }

  private def result(spark: SparkSession, op: String, version: Long): DataFrame = {
    import spark.implicits._
    Seq((op, version)).toDF("operation", "version")
  }

  /** `ANALYZE TABLE t COMPUTE STATISTICS FOR [ALL] COLUMNS [c, ...]`:
    * on an Iceberg table, publish per-column theta-sketch NDV
    * statistics (`IcebergInterop.computeNdvStats` — a puffin
    * statistics file + the spec's metadata entry, the input
    * `readWithNdvBroadcast` consumes). ALL COLUMNS analyzes every
    * NDV-sketchable column. Returns (column, ndv). */
  private def runAnalyze(spark: SparkSession, name: String,
                         cols: Option[Seq[String]],
                         allColumns: Boolean): DataFrame = {
    import spark.implicits._
    tablesOf(spark).get(name) match {
      case IceTable(base) =>
        val target: Seq[String] =
          if (allColumns)
            graft.sources.IcebergInterop.currentSparkSchema(base)
              .fields.filter(f =>
                graft.sources.IcebergInterop.ndvSketchable(f.dataType))
              .map(_.name).toSeq
          else cols.getOrElse(Seq.empty)
        require(target.nonEmpty,
          s"ANALYZE TABLE $name: no NDV-sketchable columns to analyze")
        val ndv = graft.sources.IcebergInterop
          .computeNdvStats(spark, base, target)
        target.map(c => (c, ndv(c))).toDF("column", "ndv")
      case _ => throw new IllegalArgumentException(
        s"ANALYZE TABLE $name: theta NDV statistics files are an " +
        "Iceberg feature (Delta and graft-log carry per-file min/max " +
        "stats in their logs instead)")
    }
  }

  /** `ANALYZE TABLE t COMPUTE STATISTICS` (table-level, no FOR
    * COLUMNS): on an Iceberg table, publish the spec's
    * partition-statistics file (`IcebergInterop.computePartitionStats`
    * — per-partition data/delete aggregates from manifest metadata)
    * and return it. Partition-scoped analyze
    * (`PARTITION (p='v')`) refuses — the stats file always covers the
    * whole table, per spec. */
  private def runAnalyzeTable(spark: SparkSession, name: String,
                              partitionSpec: Map[String, Option[String]])
  : DataFrame = {
    require(partitionSpec.isEmpty,
      s"ANALYZE TABLE $name PARTITION (...): the partition-statistics " +
      "file always covers every partition of the current snapshot; " +
      "drop the PARTITION clause")
    tablesOf(spark).get(name) match {
      case IceTable(base) =>
        graft.sources.IcebergInterop.computePartitionStats(spark, base)
        graft.sources.IcebergInterop.partitionStats(spark, base).get
      case _ => throw new IllegalArgumentException(
        s"ANALYZE TABLE $name: partition statistics files are an " +
        "Iceberg feature (Delta and graft-log carry per-file stats " +
        "in their logs instead)")
    }
  }

  /** `SHOW PARTITIONS t [PARTITION (k=v, ...)]`: the distinct live
    * partition tuples, Hive-rendered (`k=v/k2=v2`, one column
    * `partition`) like Spark's own command — from LOG METADATA only
    * (Delta add actions / Iceberg manifests), no data scan. Mapped
    * Delta tables render logical column names. Unpartitioned tables
    * refuse, matching Spark. */
  private def runShowPartitions(spark: SparkSession, name: String,
                                filter: Map[String, String]): DataFrame = {
    import spark.implicits._
    val tuples: Seq[Seq[(String, String)]] = tablesOf(spark).get(name) match {
      case IceTable(base) =>
        val snap = graft.sources.IcebergInterop.snapshot(spark, base)
        require(snap.specFields.nonEmpty,
          s"SHOW PARTITIONS $name: table is not partitioned")
        val order = snap.specFields.map(_.name)
        snap.files.map(f => order.map(c =>
          c -> f.partitionValues.getOrElse(c, null))).distinct
      case DeltaTable(base) =>
        val snap = graft.sources.DeltaInterop.snapshot(spark, base)
        require(snap.partitionColumns.nonEmpty,
          s"SHOW PARTITIONS $name: table is not partitioned")
        snap.files.map(f => snap.partitionColumns.map(c =>
          c -> f.partitionValues.getOrElse(snap.physicalName(c), null)))
          .distinct
      case _ => throw new IllegalArgumentException(
        s"SHOW PARTITIONS $name: graft-log tables are unpartitioned " +
        "by design")
    }
    filter.keys.foreach { k =>
      require(tuples.headOption.forall(_.exists(_._1 == k)),
        s"SHOW PARTITIONS $name: '$k' is not a partition column")
    }
    tuples
      .filter(t => filter.forall { case (k, v) =>
        t.exists { case (c, pv) => c == k && pv == v } })
      .map(_.map { case (k, v) =>
        s"$k=${if (v == null) "__HIVE_DEFAULT_PARTITION__" else v}" }
        .mkString("/"))
      .sorted
      .toDF("partition")
  }

  private def runDelete(spark: SparkSession, name: String,
                        d: DeleteFromTable): DataFrame = {
    val h = tablesOf(spark).get(name)
    // `DELETE ... WHERE k [NOT] IN (SELECT ...)`: the subquery lowers
    // to a DISTRIBUTED semi/anti join against each format's row
    // classifier — Delta deletion vectors, graft-log DVs, Iceberg
    // position deletes — never a collected driver list (billions of
    // keys at 100 TB).
    import org.apache.spark.sql.catalyst.expressions.{Exists, InSubquery, Not}
    val subqueryRouted: Option[Long] = d.condition match {
      case InSubquery(Seq(a: UnresolvedAttribute), lq) =>
        Some(deleteBySubquery(spark, h, a.nameParts.last, lq.plan,
          negated = false))
      case Not(InSubquery(Seq(a: UnresolvedAttribute), lq)) =>
        Some(deleteBySubquery(spark, h, a.nameParts.last, lq.plan,
          negated = true))
      case e: Exists =>
        // correlated EXISTS lowers to the SAME membership semi join the
        // IN route runs (single-equality correlation ≡ IN; identical
        // NULL semantics) — see lowerCorrelatedExists
        val (key, subPlan) = lowerCorrelatedExists(
          name, aliasOf(d.table).toSet, e.plan)
        Some(deleteBySubquery(spark, h, key, subPlan, negated = false))
      case Not(e: Exists) =>
        // NOT EXISTS anti-join — NOT the same as NOT IN: a NULL target
        // key has no match, so NOT EXISTS is TRUE and the row DELETES
        // (keepNullKeys=false), and inner NULLs are inert (an equality
        // anti join never matches them) — no three-valued refusal
        val (key, subPlan) = lowerCorrelatedExists(
          name, aliasOf(d.table).toSet, e.plan)
        val sub = subqueryFrame(spark, key, subPlan)
        Some(h match {
          case DeltaTable(b) => graft.sources.DeltaDml
            .deleteVectoredNotInSource(spark, b, sub, Seq(key))
          case LogTable(b) =>
            GraftLog.deleteVectoredNotInSource(spark, b, sub, key)
          case IceTable(b) => graft.sources.IcebergInterop
            .deletePositionsNotInSource(spark, b, sub, key)
        })
      case _ => None
    }
    val v = subqueryRouted.getOrElse {
      val pred = GraftBridge.column(unqualify(d.condition))
      h match {
        case LogTable(base) => GraftLog.delete(spark, base, pred)
        case DeltaTable(base) =>
          graft.sources.DeltaDml.deleteVectoredWhere(spark, base, pred)
        case IceTable(base) =>
          graft.sources.IcebergInterop.deletePositionsWhere(spark, base, pred)
      }
    }
    refreshView(spark, name, h) // follow the new head
    result(spark, "DELETE", v)
  }

  /** The `(SELECT ...)` side of an IN/NOT IN DML condition as a
    * single-column frame named `key`. */
  private def subqueryFrame(spark: SparkSession, key: String,
                            subPlan: LogicalPlan): DataFrame = {
    val sub0 = GraftBridge.ofRows(spark, subPlan)
    require(sub0.columns.length == 1,
      s"the IN subquery must produce exactly one column, " +
      s"got ${sub0.columns.length}")
    sub0.toDF(key)
  }

  /** SQL NOT IN's subquery-side three-valued edge: ONE NULL in the
    * subquery means NO row matches — a bare anti join would silently
    * apply the statement to the complement, so refuse loudly. The
    * caller passes a PERSISTED frame so this probe and the DML's join
    * read one evaluation of a possibly huge SELECT. */
  private def requireNoNullKeys(cached: DataFrame, key: String,
                                stmt: String): Unit =
    require(cached.filter(cached.col(key).isNull).isEmpty,
      s"$stmt ... NOT IN (SELECT ...): the subquery returned a NULL " +
      s"key — SQL three-valued logic makes this $stmt a no-op; " +
      "filter the NULLs explicitly if the anti-join meaning is wanted")

  private def deleteBySubquery(spark: SparkSession, h: Handler,
                               key: String, subPlan: LogicalPlan,
                               negated: Boolean): Long = {
    val sub = subqueryFrame(spark, key, subPlan)
    if (negated) {
      // both three-valued-logic edges: subquery NULL refuses (above),
      // and a NULL TARGET key compares UNKNOWN so its row SURVIVES
      // (keepNullKeys) — a bare anti join would delete it
      val cached = sub.persist()
      try {
        requireNoNullKeys(cached, key, "DELETE")
        h match {
          case DeltaTable(b) => graft.sources.DeltaDml
            .deleteVectoredNotInSource(spark, b, cached, Seq(key),
              keepNullKeys = true)
          case LogTable(b) => GraftLog.deleteVectoredNotInSource(
            spark, b, cached, key, keepNullKeys = true)
          case IceTable(b) => graft.sources.IcebergInterop
            .deletePositionsNotInSource(spark, b, cached, key,
              keepNullKeys = true)
        }
      } finally cached.unpersist()
    } else h match {
      case DeltaTable(b) =>
        graft.sources.DeltaDml.deleteVectoredInSource(spark, b, sub, Seq(key))
      case LogTable(b) =>
        GraftLog.deleteVectoredInSource(spark, b, sub, key)
      case IceTable(b) =>
        graft.sources.IcebergInterop.deletePositionsInSource(spark, b, sub, key)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Lower a correlated `EXISTS (SELECT ... FROM s WHERE s.k = t.k
    * [AND <inner conjuncts>])` to the membership shape the formats'
    * `updateInSource` already runs as a DISTRIBUTED semi join: a
    * single-equality correlation is exactly
    * `t.k IN (SELECT s.k FROM s WHERE <inner conjuncts>)` — identical
    * NULL semantics (an UNKNOWN correlation never matches, so a NULL
    * outer key is untouched either way). The outer reference must be
    * qualified by the target's name or alias; exactly ONE correlated
    * equality is supported, and no other conjunct may touch the outer
    * row (that shape is a real join condition → MERGE). */
  private def lowerCorrelatedExists(name: String, aliases: Set[String],
                                    plan: LogicalPlan): (String, LogicalPlan) = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import org.apache.spark.sql.catalyst.expressions.And
    val quals = (aliases + name).map(_.toLowerCase)
    def isOuter(a: UnresolvedAttribute): Boolean =
      a.nameParts.length == 2 && quals.contains(a.nameParts.head.toLowerCase)
    def touchesOuter(e: Expression): Boolean = e.exists {
      case a: UnresolvedAttribute => isOuter(a)
      case _ => false
    }
    val (projected, cond, child) = plan match {
      case Project(_, Filter(c, ch)) => (true, c, ch)
      case Filter(c, ch) => (false, c, ch)
      case _ => throw new IllegalArgumentException(
        "UPDATE ... WHERE EXISTS: the subquery carries no correlation " +
        "filter — an uncorrelated EXISTS is a table-level gate, not a " +
        "row selector; use MERGE or a scalar condition")
    }
    val _ = projected // EXISTS ignores the subquery's projection list
    val conjuncts = splitConjuncts(cond)
    val (corr, inner) = conjuncts.partition {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        isOuter(a) ^ isOuter(b)
      case _ => false
    }
    inner.filter(touchesOuter).foreach { e =>
      throw new IllegalArgumentException(
        s"UPDATE ... WHERE EXISTS: conjunct '${e.sql}' references the " +
        "target row in a non-equality shape — that is a join condition; " +
        "express it as MERGE INTO ... WHEN MATCHED THEN UPDATE")
    }
    require(corr.size == 1,
      s"UPDATE ... WHERE EXISTS supports exactly ONE correlated " +
      s"equality (got ${corr.size}) — multi-key correlation → MERGE")
    val (outerA, innerA) = corr.head match {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        if (isOuter(a)) (a, b) else (b, a)
      case other => throw new IllegalStateException(
        s"unreachable: non-equality in corr set: ${other.sql}")
    }
    require(!isOuter(innerA),
      s"UPDATE ... WHERE EXISTS: '${corr.head.sql}' relates the target " +
      "row to itself — the correlation must compare an inner column to " +
      "a target column")
    val filtered = inner.reduceOption(And)
      .map(Filter(_, child)).getOrElse(child)
    (outerA.nameParts.last, Project(Seq(innerA), filtered))
  }

  private def runUpdate(spark: SparkSession, name: String,
                        u: UpdateTable): DataFrame = {
    val h = tablesOf(spark).get(name)
    // `UPDATE ... WHERE k [NOT] IN (SELECT ...) [AND <scalar>...]`:
    // the subquery lowers to a DISTRIBUTED semi/anti join marking the
    // touched rows (never a collected driver list), with the scalar
    // conjuncts riding along as the extra gate. EXISTS/correlated
    // shapes still refuse toward MERGE — the census evaluates its
    // selector inside aggregates, where Spark forbids subqueries.
    import org.apache.spark.sql.catalyst.expressions.{Exists, InSubquery, Not}
    val conjuncts = u.condition.map(splitConjuncts).getOrElse(Seq.empty)
    val (subConjs, scalarConjs) = conjuncts.partition(_.exists {
      case _: InSubquery | _: Exists => true
      case _ => false
    })
    // membership mode: IN / NOT IN carry SQL's three-valued contracts
    // (subquery-NULL refusal, NULL target keys untouched); NOT EXISTS
    // is the anti join proper — NULL target keys DO update, and inner
    // NULLs are inert
    val subqueryRoute: Option[(String, LogicalPlan, String)] =
      subConjs match {
        case Seq() => None
        case Seq(InSubquery(Seq(a: UnresolvedAttribute), lq)) =>
          Some((a.nameParts.last, lq.plan, "in"))
        case Seq(Not(InSubquery(Seq(a: UnresolvedAttribute), lq))) =>
          Some((a.nameParts.last, lq.plan, "notin"))
        case Seq(e: Exists) =>
          val (key, subPlan) = lowerCorrelatedExists(
            name, aliasOf(u.table).toSet, e.plan)
          Some((key, subPlan, "in"))
        case Seq(Not(e: Exists)) =>
          val (key, subPlan) = lowerCorrelatedExists(
            name, aliasOf(u.table).toSet, e.plan)
          Some((key, subPlan, "notexists"))
        case _ => throw new IllegalArgumentException(
          "UPDATE supports at most ONE `<col> [NOT] IN (SELECT ...)` or " +
          "correlated `[NOT] EXISTS (SELECT ...)` conjunct — express " +
          "richer conditions as MERGE INTO ... USING (SELECT ...) WHEN " +
          "MATCHED THEN UPDATE")
      }
    // A multi-part SET target is accepted ONLY as <table-or-alias>.<col>:
    // resolving `a.b` by its last part would silently reroute a
    // struct-field assignment (SET a.b = 1) to a top-level column named
    // b — struct paths must fail loudly, not update the wrong column.
    val qualifiers = (Set(name) ++ aliasOf(u.table)).map(_.toLowerCase)
    val set: Map[String, org.apache.spark.sql.Column] =
      u.assignments.map { a =>
        val target = a.key match {
          case att: UnresolvedAttribute if att.nameParts.length == 1 =>
            att.nameParts.head
          case att: UnresolvedAttribute if att.nameParts.length == 2 &&
              qualifiers.contains(att.nameParts.head.toLowerCase) =>
            att.nameParts.last
          case att: UnresolvedAttribute => throw new IllegalArgumentException(
            s"UPDATE SET target '${att.sql}' is neither a column nor " +
            s"<table-or-alias>.<column> of '$name' — struct-field updates " +
            "are not supported (refusing rather than updating a " +
            "same-named top-level column)")
          case other => throw new IllegalArgumentException(
            s"UPDATE SET target must be a column, got: ${other.sql}")
        }
        target -> GraftBridge.column(unqualify(a.value))
      }.toMap
    val v = subqueryRoute match {
      case Some((key, subPlan, mode)) =>
        val negated = mode != "in"
        val includeNullKeys = mode == "notexists"
        val extra = scalarConjs
          .reduceOption(org.apache.spark.sql.catalyst.expressions.And(_, _))
          .map(c => GraftBridge.column(unqualify(c)))
        val sub = subqueryFrame(spark, key, subPlan)
        def route(src: DataFrame): Long = h match {
          case DeltaTable(b) => graft.sources.DeltaDml.updateInSource(
            spark, b, src, key, set, negated, extra,
            includeNullKeys = includeNullKeys)
          case IceTable(b) => graft.sources.IcebergInterop.updateInSource(
            spark, b, src, key, set, negated, extra,
            includeNullKeys = includeNullKeys)
          case LogTable(b) => GraftLog.updateInSource(
            spark, b, src, key, set, negated, extra,
            includeNullKeys = includeNullKeys)
        }
        if (mode == "notin") {
          // subquery-NULL three-valued edge, same contract as DELETE
          val cached = sub.persist()
          try { requireNoNullKeys(cached, key, "UPDATE"); route(cached) }
          finally cached.unpersist()
        } else route(sub)
      case None =>
        val pred = u.condition.map(c => GraftBridge.column(unqualify(c)))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        h match {
          case DeltaTable(b) =>
            graft.sources.DeltaDml.updateWhere(spark, b, pred, set)
          case IceTable(b) =>
            graft.sources.IcebergInterop.updateWhere(spark, b, pred, set)
          case LogTable(b) =>
            GraftLog.updateWhere(spark, b, pred, set)
        }
    }
    refreshView(spark, name, h)
    result(spark, "UPDATE", v)
  }

  /** The ON clause as a conjunction of shared-name key equalities
    * (t.k1 = s.k1 AND t.k2 = s.k2 → Seq(k1, k2)); anything else —
    * inequality predicates, expressions, differing column names —
    * refuses loudly. */
  private def onKeys(e: Expression): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      onKeys(l) ++ onKeys(r)
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
      Seq(a.nameParts.last)
    case other => throw new IllegalArgumentException(
      "MERGE INTO: the ON clause must be a conjunction of equalities on " +
      s"shared key columns (t.k = s.k [AND ...]), got: ${other.sql}")
  }

  /** MERGE INTO, lowered to the formats' keyed upserts. Supported
    * shape:
    *   ON t.k1 = s.k1 [AND t.k2 = s.k2 ...]
    *   WHEN MATCHED [AND <cond>] THEN UPDATE SET *
    *   WHEN NOT MATCHED [AND <cond>] THEN INSERT *
    * Conditions may reference both sides through their aliases (t.v <
    * s.v). The lowering computes the EFFECTIVE source first — matched
    * source rows whose condition holds, plus not-matched source rows
    * whose insert condition holds — and hands that to the existing
    * upsert primitive: a matched target row whose condition fails is
    * simply absent from the effective source and survives untouched, so
    * the scoped rewrite (zone maps, add.stats) still applies. The
    * condition join runs once against the registered view (one
    * key-partitioned shuffle; the plan the API path would need anyway
    * to evaluate a two-sided predicate). */
  private def runMerge(spark: SparkSession, name: String,
                       m: MergeIntoTable): DataFrame = {
    val h = tablesOf(spark).get(name)
    val keys = onKeys(m.mergeCondition)
    // None = clause absent; Some(cond) = clause present with optional gate
    val matchedUpdate: Option[Option[Expression]] = m.matchedActions match {
      case Seq() => None
      case Seq(UpdateStarAction(c)) => Some(c)
      case other => throw new IllegalArgumentException(
        "MERGE INTO supports WHEN MATCHED [AND <cond>] THEN UPDATE SET *, " +
        s"got: $other")
    }
    val notMatchedInsert: Option[Option[Expression]] = m.notMatchedActions match {
      case Seq() => None
      case Seq(InsertStarAction(c)) => Some(c)
      case other => throw new IllegalArgumentException(
        "MERGE INTO supports WHEN NOT MATCHED [AND <cond>] THEN INSERT *, " +
        s"got: $other")
    }
    val bySourceDelete: Boolean = m.notMatchedBySourceActions match {
      case Seq() => false
      case Seq(DeleteAction(None)) => true
      case other => throw new IllegalArgumentException(
        "MERGE INTO supports WHEN NOT MATCHED BY SOURCE THEN DELETE " +
        s"(unconditional), got: $other")
    }
    val source = GraftBridge.ofRows(spark, m.sourceTable)
    if (bySourceDelete)
      return runMergeBySource(spark, name, h, keys, source,
        matchedUpdate, notMatchedInsert)
    val matchedCond = matchedUpdate.getOrElse(throw new IllegalArgumentException(
      "MERGE INTO needs WHEN MATCHED THEN UPDATE SET * " +
      "(insert-only merges: use INSERT/append)"))
    val insertCond = notMatchedInsert.getOrElse(throw new IllegalArgumentException(
      "MERGE INTO needs WHEN NOT MATCHED THEN INSERT *"))
    val effSource =
      if (matchedCond.isEmpty && insertCond.isEmpty) source
      else {
        val tAlias = aliasOf(m.targetTable).getOrElse(name)
        val sAlias = aliasOf(m.sourceTable).getOrElse("__graft_merge_src")
        val target = spark.table(name)
        val srcCols = source.columns.toSeq
        val keyCond = keys.map(k =>
          org.apache.spark.sql.functions.col(s"$tAlias.$k") ===
          org.apache.spark.sql.functions.col(s"$sAlias.$k")).reduce(_ && _)
        val toUpdate = target.alias(tAlias)
          .join(source.alias(sAlias), keyCond, "inner")
          .filter(matchedCond.map(GraftBridge.column)
            .getOrElse(org.apache.spark.sql.functions.lit(true)))
          .select(srcCols.map(c =>
            org.apache.spark.sql.functions.col(s"$sAlias.$c").as(c)): _*)
        val toInsert = source.alias(sAlias)
          .join(target.alias(tAlias), keyCond, "left_anti")
          .filter(insertCond.map(GraftBridge.column)
            .getOrElse(org.apache.spark.sql.functions.lit(true)))
          .select(srcCols.map(org.apache.spark.sql.functions.col): _*)
        toUpdate.unionByName(toInsert)
      }
    val v = h match {
      case LogTable(base) =>
        // SQL MERGE contract: duplicate source keys are an error, not a
        // silent duplication (one bounded probe; the Delta path checks
        // inside mergeUpsertKeys)
        requireUniqueKeys(effSource, keys)
        if (keys.size == 1)
          GraftLog.upsertScoped(spark, base, effSource, keys.head)
        else GraftLog.upsert(spark, base, effSource, keys)
      case DeltaTable(base) =>
        // MERGE schema evolution (delta-spark's schema.autoMerge):
        // explicit session opt-in — new SOURCE columns evolve the table
        // (nullable adds; old rows read NULL) and the merge lands values
        graft.sources.DeltaDml.mergeUpsertKeys(spark, base, effSource, keys,
          evolveSchema = spark.conf.getOption(
            "spark.graft.delta.autoMerge").exists(_.toBoolean))
      case IceTable(base) =>
        // duplicate-source check lives inside the Iceberg merge
        graft.sources.IcebergInterop.mergeUpsert(spark, base, effSource, keys)
    }
    refreshView(spark, name, h) // follow the new head
    result(spark, "MERGE", v)
  }

  private def requireUniqueKeys(src: DataFrame, keys: Seq[String]): Unit = {
    val dup = src.groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
      .count().filter(org.apache.spark.sql.functions.col("count") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"merge source has duplicate (${keys.mkString(",")}) values — " +
      "SQL MERGE forbids multiple source rows per target key")
  }

  /** MERGE shapes carrying `WHEN NOT MATCHED BY SOURCE THEN DELETE`:
    *
    *  - FULL SYNC (all three clauses, unconditional): the final table
    *    is exactly the (duplicate-checked) source, so it lowers to ONE
    *    atomic definition-preserving overwrite — the only lowering
    *    here that is atomic (an upsert commit followed by a delete
    *    commit would expose a torn intermediate state). A file-scoped
    *    variant (skip files whose key range holds no change) is a
    *    future optimization, not a semantic difference.
    *  - RETENTION (only the BY SOURCE clause): delete target rows
    *    whose key has no source row — Delta lowers to the anti-join
    *    vectored delete (`deleteVectoredNotInSource`, one commit, no
    *    unbounded driver state); other formats refuse toward the
    *    full-sync shape.
    *
    * Conditional combinations refuse loudly: they have no atomic
    * lowering onto the per-format primitives this front-end targets. */
  private def runMergeBySource(spark: SparkSession, name: String, h: Handler,
                               keys: Seq[String], source: DataFrame,
                               matchedUpdate: Option[Option[Expression]],
                               notMatchedInsert: Option[Option[Expression]]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val v = (matchedUpdate, notMatchedInsert) match {
      case (Some(None), Some(None)) => // FULL SYNC
        requireUniqueKeys(source, keys)
        // conform to the table's schema (implicit-cast MERGE semantics)
        val table = spark.table(name)
        require(source.columns.toSet == table.columns.toSet,
          s"merge source must carry exactly the table columns " +
          s"(${table.columns.mkString(",")}), got " +
          s"(${source.columns.mkString(",")})")
        val conformed = source.select(table.schema.fields.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        h match {
          case LogTable(base) => GraftLog.overwrite(conformed, base)
          case DeltaTable(base) =>
            val snap = graft.sources.DeltaInterop.snapshot(spark, base)
            graft.sources.DeltaInterop.overwrite(conformed, base,
              partitionBy = snap.partitionColumns,
              configuration = snap.configuration,
              tableId = snap.tableId)
          case IceTable(base) =>
            graft.sources.IcebergInterop.overwriteTransformed(conformed,
              base, graft.sources.IcebergInterop.tableSpec(spark, base))
        }
      case (None, None) => // RETENTION
        h match {
          case DeltaTable(base) =>
            graft.sources.DeltaDml.deleteVectoredNotInSource(
              spark, base, source, keys)
          case _ => throw new IllegalArgumentException(
            "retention-only MERGE (WHEN NOT MATCHED BY SOURCE THEN DELETE " +
            "alone) is supported on Delta tables; for other formats use " +
            "the full-sync shape (all three clauses)")
        }
      case _ => throw new IllegalArgumentException(
        "WHEN NOT MATCHED BY SOURCE THEN DELETE composes only with the " +
        "UNCONDITIONAL full-sync shape (WHEN MATCHED THEN UPDATE SET * + " +
        "WHEN NOT MATCHED THEN INSERT *) or stands alone (Delta " +
        "retention) — conditional combinations have no atomic lowering")
    }
    refreshView(spark, name, h)
    result(spark, "MERGE", v)
  }
}
