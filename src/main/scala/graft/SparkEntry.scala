package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Num.{davg, dsum}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching `oracleSql` (DuckDB 1.0
  * dialect) unless the operator is not SQL-expressible with engine-portable
  * semantics (e.g. minhash buckets built on Spark's murmur3). Column names
  * are aliased identically on both sides; every query ends in a
  * deterministic ORDER BY; double aggregates go through exact decimal sums
  * (graft.ops.Num) so Spark and DuckDB agree bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Reference semantics: daily_sales_summary
    * (spark/jobs/mysql_gold_aggregation.py:117-125) transposed onto orders. */
  def entry(spark: SparkSession): DataFrame =
    qDailySales(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- parity

  /** A1 (gold_aggregation.py:97-101): groupBy category → count + avg. */
  private def qCategorySummary(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        count(col("p_partkey")).as("product_count"),
        davg(col("p_retailprice")).as("average_price"))
      .orderBy(col("p_brand"))

  /** A2 (mysql_gold_aggregation.py:117-125): daily sum + count on a
    * to_date-derived key. */
  private def qDailySales(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).cast("string").as("order_date"))
      .agg(
        dsum(col("o_totalprice")).as("total_amount"),
        count(col("o_orderkey")).as("order_count"))
      .orderBy(col("order_date"))

  /** A3 + P10 + O1 (api_gold_aggregation.py:86-92): month bucketing,
    * group count, global sort. */
  private def qMonthlyGrowth(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .withColumn("year_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy(col("year_month"))
      .agg(count(lit(1)).as("monthly_order_count"))
      .orderBy(col("year_month"))

  /** A4 (mysql_bronze_ingestion.py:77): global count as a 1-row frame. */
  private def qGlobalCount(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .agg(count(lit(1)).as("n_rows"))

  /** F1 (mysql_silver_transformation.py:62): na.drop on required columns,
    * then aggregate so the result is comparable. */
  private def qNullFilter(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .na.drop(Seq("l_quantity", "l_shipdate"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))

  /** P4-P12 (silver_transformation.py:52-53 et al.): projection with
    * casts, lower(), date derivation — the silver-layer expression set. */
  private def qSilverProjection(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).cast("double").as("price_norm"),
        lower(col("o_orderpriority")).as("priority_norm"),
        to_date(col("o_orderdate")).cast("string").as("order_date"),
        date_format(col("o_orderdate"), "yyyy-MM").as("year_month"))
      .orderBy(col("o_orderkey"))

  /** O1 analog + top-k: orderBy desc with deterministic tiebreak, limit. */
  private def qTopCustomers(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(
        col("c_custkey"),
        col("c_name"),
        col("c_acctbal").cast(DecimalType(18, 2)).cast("double").as("acctbal"))
      .orderBy(col("acctbal").desc, col("c_custkey"))
      .limit(10)

  /** TPC-H Q1 shape: multi-aggregate over derived expressions — the
    * canonical scan-dominated agg the 100 TB path must win. */
  private def qPricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // --------------------------------------------------------------- contract

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_category_summary" -> (qCategorySummary _),
    "q02_daily_sales" -> (qDailySales _),
    "q03_monthly_growth" -> (qMonthlyGrowth _),
    "q04_global_count" -> (qGlobalCount _),
    "q05_null_filter" -> (qNullFilter _),
    "q06_silver_projection" -> (qSilverProjection _),
    "q07_top_customers" -> (qTopCustomers _),
    "q08_pricing_summary" -> (qPricingSummary _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_category_summary" ->
      """SELECT p_brand,
         count(p_partkey) AS product_count,
         CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(p_retailprice) AS average_price
         FROM part GROUP BY p_brand ORDER BY p_brand""",
    "q02_daily_sales" ->
      """SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
         count(o_orderkey) AS order_count
         FROM orders GROUP BY 1 ORDER BY order_date""",
    "q03_monthly_growth" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS year_month,
         count(*) AS monthly_order_count
         FROM orders GROUP BY 1 ORDER BY year_month""",
    "q04_global_count" ->
      "SELECT count(*) AS n_rows FROM lineitem",
    "q05_null_filter" ->
      """SELECT l_returnflag, count(*) AS n_rows,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem WHERE l_quantity IS NOT NULL AND l_shipdate IS NOT NULL
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q06_silver_projection" ->
      """SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_norm,
         lower(o_orderpriority) AS priority_norm,
         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
         strftime(o_orderdate, '%Y-%m') AS year_month
         FROM orders ORDER BY o_orderkey""",
    "q07_top_customers" ->
      """SELECT c_custkey, c_name,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
         FROM customer ORDER BY acctbal DESC, c_custkey LIMIT 10""",
    "q08_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
         CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(l_discount) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
  )
}
