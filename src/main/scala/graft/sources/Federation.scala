package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Federated reads across table formats: one logical view over tables
  * that live in plain parquet, Delta Lake (`sources/DeltaInterop`),
  * Apache Iceberg (`sources/IcebergInterop`) and graft-log
  * (`pipeline/GraftLog`) — the lakehouse reality where a 100 TB estate
  * accretes formats over years and a query must span them without a
  * migration.
  *
  * Each member is resolved through its own format's snapshot machinery
  * (log replay, manifest chain, commit log), so format-level features —
  * deletion vectors, column mapping, partition pruning — keep working
  * inside the union. Schemas are aligned BY NAME with missing columns
  * null-filled (`unionByName(allowMissingColumns)`); Spark plans the
  * result as one Union of independent scans, so each member's filters
  * and column pruning push down separately and no member blocks another
  * (no barrier, no shuffle — a Union is free at plan time).
  */
object Federation {

  sealed trait Member { def path: String }
  case class Parquet(path: String) extends Member
  case class Delta(path: String, versionAsOf: Option[Long] = None) extends Member
  case class Iceberg(path: String, snapshotId: Option[Long] = None) extends Member
  case class GraftLogTable(path: String, version: Option[Long] = None) extends Member

  def readMember(spark: SparkSession, m: Member): DataFrame = m match {
    case Parquet(p)          => spark.read.parquet(p)
    case Delta(p, v)         => DeltaInterop.read(spark, p, versionAsOf = v)
    case Iceberg(p, s)       => IcebergInterop.read(spark, p, snapshotId = s)
    case GraftLogTable(p, v) => graft.pipeline.GraftLog.read(spark, p, version = v)
  }

  /** Union all members by column name; `sourceTag` (when set) appends a
    * literal column naming each member's format so downstream can audit
    * which format produced a row. */
  def unionAll(spark: SparkSession, members: Seq[Member],
               sourceTag: Option[String] = None): DataFrame = {
    require(members.nonEmpty, "federation: no members")
    val frames = members.map { m =>
      val df = readMember(spark, m)
      sourceTag.fold(df) { c =>
        df.withColumn(c, lit(m.getClass.getSimpleName.toLowerCase))
      }
    }
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** One-call table-format conversion — the migration itself, with
    * `diff` as its validation: read any member through its format's
    * full snapshot machinery (DVs applied, partitions re-attached,
    * column mapping resolved) and land it in the target format's
    * writer. The data flows as ONE distributed read→write; only
    * metadata decisions happen on the driver. Returns the target
    * member for chaining into `diff(spark, from, converted, keys)`. */
  def convert(spark: SparkSession, from: Member, to: Member,
              partitionBy: Seq[String] = Seq.empty): Member = {
    val df = readMember(spark, from)
    to match {
      case Parquet(p) =>
        require(partitionBy.isEmpty, "plain parquet target: use write partitioning upstream")
        df.write.mode("overwrite").parquet(p)
      case Delta(p, _)         => DeltaInterop.overwrite(df, p, partitionBy)
      case Iceberg(p, _)       => IcebergInterop.overwrite(df, p, partitionBy)
      case GraftLogTable(p, _) =>
        require(partitionBy.isEmpty, "graft-log clusters instead of partitioning")
        graft.pipeline.GraftLog.overwrite(df, p)
    }
    to
  }

  /** Migration validation: exact row-level diff of two members (any
    * format pair) keyed on `keys` — the check a Delta→Iceberg (or
    * lake→lakehouse) migration runs before cutting over. ONE full-outer
    * join classifies every key: `only_left`, `only_right`, or
    * `changed` (null-safe payload compare over the shared non-key
    * columns); identical rows produce NO output, so the diff of a
    * faithful migration is empty — and the operator's cost is one
    * key-partitioned shuffle regardless of table format. */
  def diff(spark: SparkSession, leftMember: Member, rightMember: Member,
           keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val l = readMember(spark, leftMember)
    val r = readMember(spark, rightMember)
    val shared = l.columns.filterNot(keys.contains)
      .intersect(r.columns.filterNot(keys.contains)).toSeq
    // presence markers, not key nullity: a legitimately-null key value
    // must not masquerade as an absent side
    val lt = l.select((keys ++ shared).map(col): _*)
      .withColumn("_l_present", lit(1)).as("l")
    val rt = r.select((keys ++ shared).map(col): _*)
      .withColumn("_r_present", lit(1)).as("r")
    val on = keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    val payloadEq = shared.map(c => col(s"l.$c") <=> col(s"r.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    lt.join(rt, on, "full_outer")
      .withColumn("_diff_type",
        when(col("_r_present").isNull, lit("only_left"))
          .when(col("_l_present").isNull, lit("only_right"))
          .when(!payloadEq, lit("changed")))
      .filter(col("_diff_type").isNotNull)
      .select(keys.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) :+
        col("_diff_type"): _*)
  }
}
