package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Apache Iceberg open-format interop from the PUBLIC table spec
  * (iceberg.apache.org/spec): a reader that resolves a Hadoop-catalog
  * table — `metadata/version-hint.text` → `vN.metadata.json` → snapshot
  * → manifest-list avro → manifest avro → parquet data files — plus a
  * minimal conformant writer used for fixtures (correct spec field IDs
  * in the avro schemas, v2 metadata JSON).
  *
  * Scope (documented in BASELINE.md): format v1/v2 reads of
  * parquet-backed append/overwrite histories; refuses delete files
  * (v2 row-level deletes need merge-on-read machinery — refusing loudly
  * beats resurrecting deleted rows). The OSS iceberg-spark runtime jars
  * are unreachable in this offline sandbox, so conformance is proven
  * against spec-format fixtures, including hand-crafted ones.
  *
  * Scale notes:
  *  - metadata resolution is driver-side and bounded by manifest count,
  *    the same contract Iceberg's own planning has (a production reader
  *    would fan manifest reads over executors once manifests number in
  *    the thousands — the avro decode per manifest is independent);
  *  - unlike Delta, Iceberg data files CONTAIN identity-partition
  *    columns, so no re-attachment pass is needed;
  *  - resolved files go to the parquet reader as one multi-path scan
  *    (pushdown / pruning / row-group skipping as on any scan).
  */
object IcebergInterop {
  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- reader

  /** One live data file: resolved local path + identity-partition values
    * (stringified, as read from the manifest's partition record; empty
    * for unpartitioned tables). */
  final case class DataFileEntry(path: String,
                                 partitionValues: Map[String, String])

  final case class IcebergSnapshot(
      snapshotId: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[DataFileEntry])

  private def metadataDir(base: String) = new File(base, "metadata")

  /** Latest metadata JSON: version-hint.text if present (Hadoop catalog
    * convention), else the highest vN.metadata.json. */
  private def currentMetadataFile(base: String): File = {
    val dir = metadataDir(base)
    require(dir.isDirectory, s"not an Iceberg table (no metadata dir): $base")
    val hint = new File(dir, "version-hint.text")
    if (hint.exists()) {
      val v = Files.readString(hint.toPath).trim.toLong
      new File(dir, s"v$v.metadata.json")
    } else {
      val vs = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.matches("v[0-9]+\\.metadata\\.json"))
      require(vs.nonEmpty, s"no vN.metadata.json under $dir")
      vs.maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toLong)
    }
  }

  /** Iceberg schema JSON → Spark schema (public type mapping from the
    * spec's "Schemas and Data Types" section). */
  private[sources] def icebergTypeToSpark(t: JsonNode): DataType =
    if (t.isTextual) {
      t.asText() match {
        case "boolean" => BooleanType
        case "int" => IntegerType
        case "long" => LongType
        case "float" => FloatType
        case "double" => DoubleType
        case "date" => DateType
        case "string" => StringType
        case "binary" => BinaryType
        case "uuid" => StringType
        case "timestamp" => TimestampNTZType  // no zone → NTZ
        case "timestamptz" => TimestampType   // UTC-adjusted instant
        case s if s.startsWith("decimal(") =>
          val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")").split(",")
          DecimalType(p.trim.toInt, sc.trim.toInt)
        case s if s.startsWith("fixed[") => BinaryType
        case other => throw new IllegalArgumentException(
          s"unsupported Iceberg type: $other")
      }
    } else t.get("type").asText() match {
      case "struct" =>
        val fields = t.get("fields")
        StructType((0 until fields.size()).map { i =>
          val f = fields.get(i)
          StructField(f.get("name").asText(),
            icebergTypeToSpark(f.get("type")),
            nullable = !f.get("required").asBoolean())
        })
      case "list" =>
        ArrayType(icebergTypeToSpark(t.get("element")),
          containsNull = !t.get("element-required").asBoolean())
      case "map" =>
        MapType(icebergTypeToSpark(t.get("key")),
          icebergTypeToSpark(t.get("value")),
          valueContainsNull = !t.get("value-required").asBoolean())
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg nested type: $other")
    }

  /** Rewrite an absolute location recorded in metadata to the local
    * table root (Iceberg paths are absolute URIs; fixtures move). */
  private def resolvePath(base: String, p: String): String = {
    val tail = p.replaceFirst("^[a-z0-9+.-]+://[^/]*", "") // strip scheme+authority
    val name = new File(tail).getName
    if (new File(tail).exists()) tail
    else if (tail.contains("/data/") || new File(s"$base/data/$name").exists())
      s"$base/data/$name"
    else s"$base/metadata/$name" // manifests + manifest lists live here
  }

  /** Field access tolerant of absent OPTIONAL spec fields: a v1 manifest
    * list has no `content` column, and GenericRecord.get throws (rather
    * than returning null) on unknown names. */
  private def opt(r: GenericRecord, name: String): Option[AnyRef] =
    if (r.getSchema.getField(name) == null) None else Option(r.get(name))

  private def readAvro(f: File): Seq[GenericRecord] = {
    val reader = DataFileReader.openReader(f, new GenericDatumReader[GenericRecord]())
    try {
      val out = mutable.ArrayBuffer.empty[GenericRecord]
      while (reader.hasNext) out += reader.next()
      out.toSeq
    } finally reader.close()
  }

  /** Resolve the table state at `snapshotId` (current by default). */
  def snapshot(spark: SparkSession, base: String,
               snapshotId: Option[Long] = None): IcebergSnapshot = {
    val meta = mapper.readTree(currentMetadataFile(base))
    val fv = meta.get("format-version").asInt()
    require(fv == 1 || fv == 2, s"unsupported Iceberg format-version $fv")
    // current schema (schemas list + current-schema-id; v1 fallback "schema")
    val schemaNode = Option(meta.get("schemas")).map { ss =>
      val want = meta.get("current-schema-id").asInt()
      (0 until ss.size()).map(ss.get)
        .find(_.get("schema-id").asInt() == want)
        .getOrElse(throw new IllegalStateException(s"schema-id $want not found"))
    }.orElse(Option(meta.get("schema")))
      .getOrElse(throw new IllegalStateException(s"no schema in metadata of $base"))
    val schema = icebergTypeToSpark(schemaNode).asInstanceOf[StructType]

    val snaps = Option(meta.get("snapshots")).getOrElse(
      throw new IllegalStateException(s"no snapshots in $base"))
    val wantId = snapshotId.getOrElse(meta.get("current-snapshot-id").asLong())
    val snap = (0 until snaps.size()).map(snaps.get)
      .find(_.get("snapshot-id").asLong() == wantId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $wantId not found in $base"))

    // default partition spec → identity partition column names (the only
    // transform this reader prunes on; other transforms read fine, they
    // just never prune)
    val partCols: Seq[String] = Option(meta.get("partition-specs")).map { specs =>
      val want = Option(meta.get("default-spec-id")).map(_.asInt()).getOrElse(0)
      (0 until specs.size()).map(specs.get)
        .find(s => s.get("spec-id").asInt() == want)
        .map { s =>
          val fs = s.get("fields")
          (0 until fs.size()).map(fs.get)
            .filter(f => Option(f.get("transform")).forall(_.asText() == "identity"))
            .map(_.get("name").asText())
        }.getOrElse(Seq.empty)
    }.getOrElse(Seq.empty)

    val manifestList = new File(resolvePath(base,
      snap.get("manifest-list").asText()))
    val files = mutable.ArrayBuffer.empty[DataFileEntry]
    readAvro(manifestList).foreach { m =>
      val content = opt(m, "content").map(_.toString.toInt).getOrElse(0)
      require(content == 0,
        "Iceberg delete manifests present — row-level deletes need " +
        "merge-on-read support this reader does not implement (refusing)")
      val mPath = new File(resolvePath(base, m.get("manifest_path").toString))
      readAvro(mPath).foreach { e =>
        val status = e.get("status").toString.toInt
        if (status != 2) { // 0 existing, 1 added, 2 deleted
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          opt(df, "content").foreach(c => require(c.toString.toInt == 0,
            "Iceberg delete file in data manifest — unsupported (refusing)"))
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("PARQUET"),
            s"unsupported Iceberg data file format $fmt")
          // partition record: field names = partition names (identity);
          // values stringified for engine-neutral comparison
          val pv: Map[String, String] = opt(df, "partition").map {
            case r: GenericRecord =>
              import scala.jdk.CollectionConverters._
              r.getSchema.getFields.asScala.map(f =>
                f.name() -> Option(r.get(f.name())).map(_.toString).orNull).toMap
            case _ => Map.empty[String, String]
          }.getOrElse(Map.empty)
          files += DataFileEntry(
            resolvePath(base, df.get("file_path").toString), pv)
        }
      }
    }
    IcebergSnapshot(wantId, schema, partCols, files.distinctBy(_.path).toSeq)
  }

  /** Read an Iceberg table into a DataFrame (current snapshot, or
    * `snapshotId` time travel).
    *
    * `partitionFilters` (column → required stringified value) prune the
    * FILE LIST from the manifests before any scan is planned — Iceberg's
    * own metadata-pruning contract for identity partitions. Data files
    * carry identity-partition columns (unlike Delta), so no value
    * re-attachment happens: pruning only shrinks the scan. */
  def read(spark: SparkSession, base: String,
           snapshotId: Option[Long] = None,
           partitionFilters: Map[String, String] = Map.empty): DataFrame = {
    val snap = snapshot(spark, base, snapshotId)
    partitionFilters.keys.foreach(k => require(
      snap.partitionColumns.contains(k),
      s"'$k' is not an identity partition column of $base " +
      s"(have ${snap.partitionColumns})"))
    val kept =
      if (partitionFilters.isEmpty) snap.files
      else snap.files.filter(f => partitionFilters.forall {
        case (k, v) => f.partitionValues.get(k).contains(v) })
    if (kept.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else spark.read.schema(snap.schema).parquet(kept.map(_.path): _*)
  }

  // ------------------------------------------------------------- writer

  /** Spark type → Iceberg schema JSON node (writer side; ids assigned
    * sequentially, as the spec requires distinct field ids). */
  private def sparkTypeToIceberg(dt: DataType): String = dt match {
    case BooleanType => "\"boolean\""
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case DateType => "\"date\""
    case StringType => "\"string\""
    case BinaryType => "\"binary\""
    case TimestampType => "\"timestamptz\""
    case TimestampNTZType => "\"timestamp\""
    case d: DecimalType => s""""decimal(${d.precision},${d.scale})""""
    case other => throw new IllegalArgumentException(
      s"writer does not map Spark type $other to Iceberg")
  }

  private def schemaJson(schema: StructType): String = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id":${i + 1},"name":"${f.name}","required":${!f.nullable},"type":${sparkTypeToIceberg(f.dataType)}}"""
    }
    s"""{"type":"struct","schema-id":0,"fields":[${fields.mkString(",")}]}"""
  }

  // avro schemas with the spec's field ids (manifest_entry ids 0-2,
  // data_file ids 100-104+134, partition record 102 with field ids
  // 1000+). The entry schema is built per table because the partition
  // record's fields mirror the partition spec.
  private def avroPrimitive(dt: DataType): String = dt match {
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case StringType => "\"string\""
    case DoubleType => "\"double\""
    case other => throw new IllegalArgumentException(
      s"unsupported identity-partition type $other")
  }

  private def entrySchemaFor(partCols: Seq[(String, DataType)]): AvroSchema = {
    val partitionField =
      if (partCols.isEmpty) ""
      else {
        val fs = partCols.zipWithIndex.map { case ((c, dt), i) =>
          s"""{"name":"$c","type":[${avroPrimitive(dt)},"null"],"field-id":${1000 + i}}"""
        }.mkString(",")
        s""",{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$fs]}}"""
      }
    new AvroSchema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":"long","field-id":1},
         |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
         |  {"name":"content","type":"int","field-id":134},
         |  {"name":"file_path","type":"string","field-id":100},
         |  {"name":"file_format","type":"string","field-id":101},
         |  {"name":"record_count","type":"long","field-id":103},
         |  {"name":"file_size_in_bytes","type":"long","field-id":104}
         |  $partitionField
         |]}}]}""".stripMargin.replaceAll("\n", ""))
  }

  private val manifestFileSchema: AvroSchema = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin.replaceAll("\n", ""))

  private def writeAvro(f: File, schema: AvroSchema,
                        rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    try rows.foreach(w.append) finally w.close()
  }

  private final case class TableState(
      version: Long, lastSnapshotId: Long,
      snapshots: Seq[(Long, String)], // (snapshotId, manifest-list path)
      liveManifests: Seq[File])       // manifests of the CURRENT snapshot

  /** Commit `df` as the next snapshot. `mode` "overwrite" starts the
    * file set fresh; "append" carries the previous snapshot's manifests
    * forward (manifest reuse, as Iceberg itself does). */
  private def commitSnapshot(df: DataFrame, base: String, mode: String,
                             partitionBy: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    val metaDir = metadataDir(base); metaDir.mkdirs()
    val dataDir = new File(base, "data"); dataDir.mkdirs()
    val hint = new File(metaDir, "version-hint.text")
    val prev: Option[JsonNode] =
      if (hint.exists()) Some(mapper.readTree(currentMetadataFile(base))) else None
    if (mode == "append") prev.foreach { m =>
      require(DataType.fromJson(
        // schema equality check via Spark round trip
        icebergSchemaToSparkJson(m)) == df.schema,
        s"iceberg fixture writer: append schema must match table schema")
    }
    val partTypes: Seq[(String, DataType)] =
      partitionBy.map(c => c -> df.schema(c).dataType)

    // 1. stage data files. Identity partitioning keeps the partition
    // columns IN the data files (Iceberg's shape, unlike Delta/hive) and
    // writes one file set per partition tuple; the driver loop is
    // bounded by the partition count (a production writer fans this out,
    // same as Iceberg's own fan-out writer).
    val id = UUID.randomUUID().toString
    val dataFiles: Seq[(File, Map[String, Any])] =
      if (partitionBy.isEmpty) {
        val scratch = new File(base, s".stage_${UUID.randomUUID()}")
        df.write.mode("overwrite").parquet(scratch.getPath)
        val parts = Option(scratch.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .sortBy(_.getName)
        val staged = parts.zipWithIndex.map { case (p, i) =>
          val name = s"$id-$i.parquet"
          Files.move(p.toPath, Paths.get(dataDir.getPath, name),
            StandardCopyOption.ATOMIC_MOVE)
          (new File(dataDir, name), Map.empty[String, Any])
        }.toSeq
        org.apache.commons.io.FileUtils.deleteDirectory(scratch)
        staged
      } else {
        import org.apache.spark.sql.functions.col
        val tuples = df.select(partitionBy.map(col): _*).distinct()
          .collect() // bounded by partition count
        tuples.toSeq.sortBy(_.toString).zipWithIndex.map { case (t, pi) =>
          val values: Map[String, Any] =
            partitionBy.zipWithIndex.map { case (c, i) => c -> t.get(i) }.toMap
          val pred = partitionBy.zipWithIndex.map { case (c, i) =>
            if (t.isNullAt(i)) col(c).isNull else col(c) === t.get(i)
          }.reduce(_ && _)
          val scratch = new File(base, s".stage_${UUID.randomUUID()}")
          df.filter(pred).coalesce(1).write.mode("overwrite")
            .parquet(scratch.getPath)
          val part = Option(scratch.listFiles()).getOrElse(Array.empty)
            .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException("no part file staged"))
          val name = s"$id-$pi.parquet"
          Files.move(part.toPath, Paths.get(dataDir.getPath, name),
            StandardCopyOption.ATOMIC_MOVE)
          org.apache.commons.io.FileUtils.deleteDirectory(scratch)
          (new File(dataDir, name), values)
        }
      }

    // 2. one new manifest for the added files
    val snapshotId = prev.map(_.get("current-snapshot-id").asLong() + 1).getOrElse(1L)
    val entrySchema = entrySchemaFor(partTypes)
    val mName = s"manifest-$id.avro"
    val mFile = new File(metaDir, mName)
    val entries = dataFiles.map { case (f, pv) =>
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", 1); rec.put("snapshot_id", snapshotId)
      val dfSchema = entrySchema.getField("data_file").schema()
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", 0)
      dfr.put("file_path", f.getAbsolutePath)
      dfr.put("file_format", "PARQUET")
      dfr.put("record_count", 0L) // fixtures don't track counts
      dfr.put("file_size_in_bytes", f.length())
      if (partitionBy.nonEmpty) {
        val pr = new GenericData.Record(dfSchema.getField("partition").schema())
        pv.foreach { case (k, v) => pr.put(k, v) }
        dfr.put("partition", pr)
      }
      rec.put("data_file", dfr)
      rec
    }
    writeAvro(mFile, entrySchema, entries)

    // 3. manifest list = new manifest (+ carried manifests on append)
    val carried: Seq[File] =
      if (mode == "append" && prev.isDefined) {
        val curSnapId = prev.get.get("current-snapshot-id").asLong()
        val snaps = prev.get.get("snapshots")
        val cur = (0 until snaps.size()).map(snaps.get)
          .find(_.get("snapshot-id").asLong() == curSnapId).get
        readAvro(new File(resolvePath(base, cur.get("manifest-list").asText())))
          .map(r => new File(resolvePath(base, r.get("manifest_path").toString)))
      } else Seq.empty
    val mlName = s"snap-$snapshotId-$id.avro"
    val mlFile = new File(metaDir, mlName)
    val mlRows = (carried :+ mFile).map { m =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", m.getAbsolutePath)
      r.put("manifest_length", m.length())
      r.put("partition_spec_id", 0)
      r.put("content", 0)
      r.put("added_snapshot_id", snapshotId)
      r
    }
    writeAvro(mlFile, manifestFileSchema, mlRows)

    // 4. new metadata json + version hint (atomic rename commit)
    val version = prev.flatMap(_ => Some(
      Files.readString(hint.toPath).trim.toLong + 1)).getOrElse(1L)
    val prevSnapshots: Seq[String] = prev.map { m =>
      val snaps = m.get("snapshots")
      (0 until snaps.size()).map(i => mapper.writeValueAsString(snaps.get(i)))
    }.getOrElse(Seq.empty)
    val snapJson =
      s"""{"snapshot-id":$snapshotId,"sequence-number":$snapshotId,
         |"timestamp-ms":0,"manifest-list":"${mlFile.getAbsolutePath}",
         |"summary":{"operation":"$mode"},"schema-id":0}"""
        .stripMargin.replaceAll("\n", "")
    val specFields = partitionBy.zipWithIndex.map { case (c, i) =>
      val sourceId = df.schema.fieldNames.indexOf(c) + 1 // writer assigns ids 1..n
      s"""{"name":"$c","transform":"identity","source-id":$sourceId,"field-id":${1000 + i}}"""
    }.mkString(",")
    val metaJson =
      s"""{"format-version":2,"table-uuid":"${UUID.randomUUID()}",
         |"location":"$base","last-sequence-number":$snapshotId,
         |"last-updated-ms":0,"last-column-id":${df.schema.size},
         |"current-schema-id":0,"schemas":[${schemaJson(df.schema)}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[$specFields]}],
         |"last-partition-id":${999 + partitionBy.size},"default-sort-order-id":0,
         |"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":$snapshotId,
         |"snapshots":[${(prevSnapshots :+ snapJson).mkString(",")}]}"""
        .stripMargin.replaceAll("\n", "")
    // validate our own JSON before publishing
    mapper.readTree(metaJson)
    val tmp = new File(metaDir, s".tmp_${UUID.randomUUID()}")
    Files.writeString(tmp.toPath, metaJson)
    val dst = new File(metaDir, s"v$version.metadata.json")
    if (!tmp.renameTo(dst)) {
      tmp.delete()
      throw new java.util.ConcurrentModificationException(
        s"iceberg metadata v$version already exists in $base")
    }
    Files.writeString(hint.toPath, version.toString)
    snapshotId
  }

  private def icebergSchemaToSparkJson(meta: JsonNode): String = {
    val ss = meta.get("schemas")
    val want = meta.get("current-schema-id").asInt()
    val node = (0 until ss.size()).map(ss.get)
      .find(_.get("schema-id").asInt() == want).get
    icebergTypeToSpark(node).json
  }

  def overwrite(df: DataFrame, base: String,
                partitionBy: Seq[String] = Seq.empty): Long =
    commitSnapshot(df, base, "overwrite", partitionBy)

  /** Append; `partitionBy` must repeat the table's partition spec (the
    * fixture-writer contract — a real writer reads it from metadata). */
  def append(df: DataFrame, base: String,
             partitionBy: Seq[String] = Seq.empty): Long =
    commitSnapshot(df, base, "append", partitionBy)
}
