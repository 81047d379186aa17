package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.sources.{DeltaInterop, TableIO}

/** Streaming CHANGE-FEED source over a Delta table — the streaming
  * analogue of `DeltaDml.readChangeFeed`, built the same way as
  * `GraftLogStream`: a commit-driven hard-link mirror + Spark's
  * checkpointed parquet file stream (exactly-once delivery across
  * restarts comes from the file source's offset log, all public API).
  *
  * Per commit the mirror links:
  *  - `cdc` actions' `_change_data` files under `v<version>-c-<name>` —
  *    authoritative change rows carrying their own `_change_type`
  *    column (what a CDF-enabled writer produces for UPDATE/DELETE/
  *    MERGE);
  *  - otherwise the add/remove file diff under `-i-` / `-d-` names
  *    (insert/delete recovered from the link name, exactly like the
  *    graft-log mirror).
  *
  * PARTITIONED tables mirror into Hive-layout subdirectories built
  * from each action's own `partitionValues` (sorted by key, values
  * escaped exactly as Spark's `ExternalCatalogUtils.escapePathName`,
  * nulls as `__HIVE_DEFAULT_PARTITION__`), so the file stream's
  * partition discovery recovers the partition columns the data files
  * do not physically carry — the same directory contract delta-spark's
  * own writers rely on.
  *
  * Deletion-vector transitions WITHOUT cdc rows cannot be expressed by
  * a hard-link mirror ("some rows of this file died"); by default they
  * are refused loudly — CDF-enabled tables never hit this, the DV
  * delete writes cdc rows. `skipChangeCommits=true` (delta-spark's
  * public streaming option of the same name) instead SKIPS such
  * data-changing commits entirely — only pure appends flow, the
  * documented at-most-the-appends contract for readers that tolerate
  * missing retractions. */
object DeltaStream {

  private val CdfMarker = "_delta_cdf_sync.json"
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val CommitName = "^[0-9]{20}\\.json$".r

  import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

  /** Hive-layout partition prefix ("k1=v1/k2=v2/") for an action's
    * partitionValues — keys SORTED so every file agrees on one
    * directory structure, values escaped with Spark's own rules so the
    * read side's partition discovery parses them back verbatim. Empty
    * strings fold into the default-partition marker alongside NULL —
    * the Hive directory layout cannot distinguish them (Spark's own
    * partitioned writers have the same collapse), so both read back as
    * NULL; the batch readChangeFeed keeps the exact action values. */
  private def pvDir(pv: Map[String, String]): String =
    if (pv.isEmpty) ""
    else pv.toSeq.sortBy(_._1).map { case (k, v) =>
      val ev = if (v == null || v.isEmpty) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
               else ExternalCatalogUtils.escapePathName(v)
      s"${ExternalCatalogUtils.escapePathName(k)}=$ev"
    }.mkString("", "/", "/")

  private def parsePv(n: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
    Option(n).filterNot(_.isNull).map { o =>
      val b = Map.newBuilder[String, String]
      val it = o.fields()
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      b.result()
    }.getOrElse(Map.empty)

  /** Mirror state: last synced version + the set of data paths whose
    * LIVE form carries a deletion vector. The set is what makes the
    * DV refusal sound for EXTERNAL writers too: a remove action is not
    * required to repeat the file's deletionVector descriptor, so the
    * action alone cannot prove a removed file was DV-free — the state,
    * built from every add action since version 0, can. */
  private def io: TableIO = TableIO()

  private def syncState(feedDir: String): (Long, Set[String]) = {
    val f = TableIO.join(feedDir, CdfMarker)
    if (!io.exists(f)) return (-1L, Set.empty)
    val n = mapper.readTree(io.readString(f))
    val dv = Option(n.get("dvPaths")).map(a =>
      (0 until a.size()).map(a.get(_).asText()).toSet).getOrElse(Set.empty)
    (n.get("syncedVersion").asLong(), dv)
  }

  /** Advance the CDF mirror to the log head; idempotent and crash-safe
    * (EEXIST on a link is success; the marker lands atomically after
    * all links). Returns the synced version. */
  def syncCdfFeed(base: String, feedDir: String,
                  skipChangeCommits: Boolean = false): Long = {
    io.mkdirs(feedDir)
    val (from, dvPaths0) = syncState(feedDir)
    val dvPaths = scala.collection.mutable.Set.empty[String] ++ dvPaths0
    val logDir = TableIO.join(base, "_delta_log")
    require(io.isDirectory(logDir), s"not a Delta table (no _delta_log): $base")
    val fresh = io.list(logDir)
      .filter(CommitName.matches).sorted
      .map(f => (f.stripSuffix(".json").toLong, TableIO.join(logDir, f)))
      .filter(_._1 > from)
    if (fresh.isEmpty) return from
    fresh.foreach { case (v, cf) =>
      val cdc = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
      val adds = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, Map[String, String])]
      val removes = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, Map[String, String])]
      io.readLines(cf).foreach { line =>
        if (line.nonEmpty) {
          val n = mapper.readTree(line)
          Option(n.get("cdc")).foreach(c => cdc += ((c.get("path").asText(),
            parsePv(c.get("partitionValues")))))
          Option(n.get("add")).foreach { a =>
            if (Option(a.get("dataChange")).forall(_.asBoolean(true)))
              adds += ((a.get("path").asText(),
                Option(a.get("deletionVector")).exists(!_.isNull),
                parsePv(a.get("partitionValues"))))
          }
          Option(n.get("remove")).foreach { r =>
            if (Option(r.get("dataChange")).forall(_.asBoolean(true)))
              removes += ((r.get("path").asText(),
                Option(r.get("deletionVector")).exists(!_.isNull),
                parsePv(r.get("partitionValues"))))
          }
        }
      }
      def link(rel: String, tag: String, pv: Map[String, String]): Unit = {
        // the action's path is URI-encoded (protocol: a relative URI —
        // Hive-escaped partition dirs double-encode) — resolve the real
        // on-disk file the same way the scan does; flatten its
        // subdirectories (_change_data/..., partition dirs) into the
        // link name, '%' swapped out so the flat NAME never carries
        // URI-escape bytes. Partition values re-attach as the mirror's
        // OWN Hive-layout directories, derived from the action
        // (authoritative), which the file source's partition discovery
        // unescapes — the one place escape bytes belong.
        val src = DeltaInterop.resolveDataFile(base, rel)
        val flat = graft.sources.PathCodec.percentDecode(rel)
          .replace("/", "__").replace("%", "_pct_")
        val dir = pvDir(pv)
        if (dir.nonEmpty) io.mkdirs(TableIO.join(feedDir, dir.stripSuffix("/")))
        io.mirror(src, TableIO.join(feedDir, f"${dir}v$v%020d-$tag-$flat"))
      }
      if (cdc.nonEmpty) cdc.foreach { case (p, pv) => link(p, "c", pv) }
      else {
        // a removed file whose LIVE form carried a DV cannot be
        // mirrored (its dead rows would re-emit as deletes) — the
        // check consults the tracked state, not just the remove
        // action's optional descriptor
        val dvCommit = adds.exists(_._2) ||
          removes.exists { case (p, hadDv, _) => hadDv || dvPaths.contains(p) }
        if (dvCommit && skipChangeCommits) {
          // delta-spark's skipChangeCommits: the data-changing commit is
          // ignored ENTIRELY (adds included) — nothing links for it
        } else {
          require(!dvCommit,
            s"delta cdf mirror cannot express the deletion-vector commit " +
            s"v$v of $base without cdc rows — enable " +
            "delta.enableChangeDataFeed (the DML writers then emit " +
            "_change_data), pass skipChangeCommits=true to drop such " +
            "commits, or use the batch DeltaDml.readChangeFeed")
          adds.foreach { case (p, _, pv) => link(p, "i", pv) }
          removes.foreach { case (p, _, pv) => link(p, "d", pv) }
        }
      }
      // state update AFTER the refusal check, for cdc commits too (a
      // DV delete WITH cdc still leaves a DV-carrying live file)
      removes.foreach { case (p, _, _) => dvPaths -= p }
      adds.foreach { case (p, hasDv, _) =>
        if (hasDv) dvPaths += p else dvPaths -= p }
    }
    val head = fresh.last._1
    val stateNode = mapper.createObjectNode()
    stateNode.put("syncedVersion", head)
    val arr = stateNode.putArray("dvPaths")
    dvPaths.toSeq.sorted.foreach(arr.add)
    val tmp = TableIO.join(feedDir, s".tmp_cdf_${java.util.UUID.randomUUID()}")
    io.writeString(tmp, mapper.writeValueAsString(stateNode))
    io.moveReplace(tmp, TableIO.join(feedDir, CdfMarker))
    head
  }

  /** The change feed as a streaming DataFrame: table columns +
    * `_change_type` + `_commit_version`. cdc-file rows carry their own
    * change type (read from the file); file-diff rows recover it from
    * the link tag; partition columns resolve from the mirror's
    * Hive-layout directories (the data files do not carry them).
    * Re-call `syncCdfFeed` to surface commits landing while the stream
    * runs. */
  def tailChangeFeed(spark: SparkSession, base: String, feedDir: String,
                     options: Map[String, String] = Map.empty,
                     skipChangeCommits: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.MetadataBuilder
    val snap = DeltaInterop.snapshot(spark, base)
    syncCdfFeed(base, feedDir, skipChangeCommits)
    // Column-mapped tables: the mirrored files (cdc AND data) carry
    // PHYSICAL column names / parquet field ids — scan by the physical
    // shape, project back to logical names after (the same resolution
    // the batch mapped-scan path does). `_change_type` is a CDF
    // metadata column outside the mapped schema, always by name.
    // PARTITION columns never come from the files at all — they come
    // from the mirror's directory names, which are the actions'
    // physical-keyed partitionValues — so they scan by PHYSICAL name in
    // every mapping mode (field-id resolution only applies to columns
    // physically present in the parquet).
    val idMode = snap.columnMappingMode == "id"
    if (idMode)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val partCols = snap.partitionColumns.toSet
    val physFields = snap.schema.fields.map { f =>
      if (snap.columnMappingMode == "none") f
      else if (partCols.contains(f.name))
        f.copy(name = snap.physicalName(f.name))
      else if (idMode) {
        val id = snap.fieldId(f.name).getOrElse(throw new IllegalStateException(
          s"columnMapping.mode=id but field '${f.name}' has no " +
          "delta.columnMapping.id — corrupt metadata (refusing)"))
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong("parquet.field.id", id).build())
      } else f.copy(name = snap.physicalName(f.name))
    }
    def scanName(logical: String): String =
      if (snap.columnMappingMode == "none") logical
      else if (partCols.contains(logical)) snap.physicalName(logical)
      else if (idMode) logical
      else snap.physicalName(logical)
    val schema = StructType(physFields :+
      StructField("_change_type", StringType))
    spark.readStream.schema(schema).options(options).parquet(feedDir)
      .select(col("*"), col("_metadata.file_name").as("__cdf_file"))
      .withColumn("_commit_version",
        regexp_extract(col("__cdf_file"), "^v(\\d{20})-", 1).cast("long"))
      .withColumn("_change_type",
        when(regexp_extract(col("__cdf_file"), "^v\\d{20}-(c|i|d)-", 1) === "c",
          col("_change_type"))
        .when(regexp_extract(col("__cdf_file"), "^v\\d{20}-(c|i|d)-", 1) === "d",
          lit("delete"))
        .otherwise(lit("insert")))
      .select(snap.schema.fields.map(f =>
        col(s"`${scanName(f.name)}`").as(f.name)) ++
        Seq(col("_change_type"), col("_commit_version")): _*)
  }
}
