package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source scans (SURVEY.md §2.1, S1–S7). Explicit `StructType` first —
  * the reference's best habit (spark/jobs/silver_transformation.py:25-44)
  * — schema inference only where the reference inferred.
  *
  * Scale notes: CSV/JSON/XML scans parallelize by file split; JDBC needs
  * an explicit partitionColumn to parallelize (the reference's
  * single-partition scan — mysql_bronze_ingestion.py:72-75 — is the
  * anti-pattern `jdbcPartitioned` fixes).
  */
object Readers {

  /** S1: CSV with header, inferred schema
    * (reference: spark/jobs/bronze_ingestion.py:23-26). */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S1b: CSV with a pinned schema (no inference pass over the data). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S2: JSON with explicit schema
    * (reference: spark/jobs/api_bronze_ingestion.py:12-26). multiLine
    * handles pretty-printed JSON arrays — the reference's users.json is
    * one (scripts/ingest_api_data.py:15 writes indent=4; a bare read
    * yields only _corrupt_record). */
  def json(spark: SparkSession, path: String, schema: StructType,
           multiLine: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("multiLine", multiLine.toString).json(path)

  /** S2b: JSONL (one JSON document per line) — the 100 TB shape. A
    * multiLine file is ONE unsplittable task however big it is; JSONL
    * splits at newlines, so a large file fans out across the cluster
    * like any text source (spark.sql.files.maxPartitionBytes decides
    * the split size). Prefer this for corpora; `json(multiLine=true)`
    * stays as the reference-parity reader for pretty-printed exports. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S3: XML with rowTag (reference: spark/jobs/xml_bronze_ingestion.py:27-30;
    * native in Spark 4.x — no external spark-xml package). Schema
    * INFERENCE scans the XML twice (sample pass + read pass) — faithful
    * to the reference, but at 100 TB use the pinned-schema overload. */
  def xml(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read.format("xml").option("rowTag", rowTag).load(path)

  /** S3b: XML with a pinned schema — ONE pass over the data (no inference
    * sample scan), and the declared types (e.g. int32 keys) survive
    * instead of inference's integer→long widening. */
  def xml(spark: SparkSession, path: String, rowTag: String,
          schema: StructType): DataFrame =
    spark.read.format("xml").option("rowTag", rowTag).schema(schema).load(path)

  /** S4: JDBC full-table scan (reference:
    * spark/jobs/mysql_bronze_ingestion.py:65-94 — single partition). */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** MySQL connection URL hardened for ingestion (reference:
    * spark/jobs/mysql_bronze_ingestion.py:65-94 reads
    * `sales.transactions`, db/init.sql:4-10): MySQL permits the
    * zero-date `'0000-00-00 00:00:00'`, which the Connector/J driver
    * throws on by default mid-scan. `zeroDateTimeBehavior=convertToNull`
    * maps them to NULL — the only representation Spark's TimestampType
    * has for them — so a single bad row can't kill a bronze load.
    * Appends the parameter only when the caller hasn't set it. */
  def mysqlJdbcUrl(url: String): String =
    if (url.toLowerCase(java.util.Locale.ROOT)
          .contains("zerodatetimebehavior=")) url
    else if (url.contains("?")) s"$url&zeroDateTimeBehavior=convertToNull"
    else s"$url?zeroDateTimeBehavior=convertToNull"

  /** S4 for MySQL specifically: the plain scan with the zero-date
    * guard applied to the URL. Type mapping notes (Spark's MySQL
    * dialect, pinned in JdbcDialectSpec against the same shapes):
    * DATETIME → timestamp, BIGINT UNSIGNED → decimal(20,0) (values
    * above Long.MaxValue are legal), TINYINT(1) → boolean unless
    * tinyInt1isBit=false. */
  def mysqlJdbc(spark: SparkSession, url: String, table: String,
                props: Properties): DataFrame =
    jdbc(spark, mysqlJdbcUrl(url), table, props)

  /** S4 at 100×: register a DSv2 JDBC catalog with AGGREGATE pushdown.
    * `spark.table("<name>.<schema>.<table>")` scans then compile
    * COUNT/SUM/MIN/MAX/AVG + GROUP BY into the source's SQL (visible
    * as `PushedAggregates` in the scan), so a bronze job that only
    * needs per-group totals moves group-count rows over the wire, not
    * the table. The v1 `jdbc()` path cannot do this — aggregate
    * pushdown is a DSv2 capability (Spark's JDBCScanBuilder implements
    * SupportsPushDownAggregates) — which is why the catalog route
    * exists alongside it. Limit/offset/column pruning push down too. */
  def jdbcCatalog(spark: SparkSession, name: String, url: String,
                  props: Map[String, String] = Map.empty): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    spark.conf.set(s"spark.sql.catalog.$name.pushDownAggregate", "true")
    spark.conf.set(s"spark.sql.catalog.$name.pushDownLimit", "true")
    spark.conf.set(s"spark.sql.catalog.$name.pushDownOffset", "true")
    props.foreach { case (k, v) =>
      spark.conf.set(s"spark.sql.catalog.$name.$k", v) }
  }

  /** S4 at scale: range-partitioned JDBC scan — `numPartitions` parallel
    * readers over `partitionColumn` strides. This is what the reference's
    * single-partition scan must become on any table that matters. */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int,
                      props: Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** S5: self-describing Parquet scan
    * (reference: spark/jobs/mysql_silver_transformation.py:42). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S6: Parquet with declared schema
    * (reference: spark/jobs/silver_transformation.py:25-44). */
  def parquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  /** ORC scan (capability extension: the second columnar at-rest format
    * Spark ships natively; a lakehouse bronze layer ingests it as-is). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S7: catalog table scan via SQL
    * (reference: spark/jobs/mysql_gold_aggregation.py:179). */
  def table(spark: SparkSession, db: String, table: String): DataFrame =
    spark.sql(s"SELECT * FROM $db.$table")

  /** S8: HTTP JSON API → DataFrame (reference fetches with plain Python
    * before Spark — scripts/ingest_api_data.py:4-20 against
    * api/main.py:30-32). The fetch happens EAGERLY on the driver (one
    * bounded API response, like the reference's users endpoint), so the
    * returned DataFrame is self-contained — the server may go away
    * before the first action. For many URLs / large payloads use
    * `httpJsonPartitioned`: the fetch moves to the executors. */
  def httpJson(spark: SparkSession, url: String, schema: StructType,
               timeoutMs: Long = 30000): DataFrame = {
    val body = httpGet(url, timeoutMs)
    import spark.implicits._
    spark.read.schema(schema)
      .option("multiLine", "true")
      .json(spark.createDataset(Seq(body)))
  }

  /** S8 at scale: one HTTP fetch per URL, executed ON THE EXECUTORS via
    * mapPartitions (connection setup amortized per partition) — the
    * shape a 1000-endpoint ingest needs; the driver never sees a
    * payload. URLs must be live at ACTION time. */
  def httpJsonPartitioned(spark: SparkSession, urls: Seq[String],
                          schema: StructType,
                          timeoutMs: Long = 30000): DataFrame = {
    import spark.implicits._
    if (urls.isEmpty)
      // repartition(0) is an error; an empty endpoint list is not
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val bodies = spark.createDataset(urls)
      .repartition(math.min(urls.size, 32))
      .mapPartitions { it =>
        // ONE client per partition — connection pool amortized over the
        // partition's URLs, not rebuilt per fetch
        val client = newClient(timeoutMs)
        it.map(u => httpGet(client, u, timeoutMs))
      }
    spark.read.schema(schema).option("multiLine", "true").json(bodies)
  }

  private def newClient(timeoutMs: Long): java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

  private def httpGet(url: String, timeoutMs: Long): String =
    httpGet(newClient(timeoutMs), url, timeoutMs)

  private def httpGet(client: java.net.http.HttpClient, url: String,
                      timeoutMs: Long): String = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"HTTP ${resp.statusCode()} fetching $url")
    resp.body()
  }
}
