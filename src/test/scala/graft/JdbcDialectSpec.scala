package graft

import java.util.Properties

import org.apache.spark.sql.types._

/** MySQL-dialect JDBC behavior, pinned against embedded Derby (the
  * sandbox has no MySQL server). The reference ingests MySQL
  * (spark/jobs/mysql_bronze_ingestion.py:65-94; schema db/init.sql:4-10)
  * — these cases pin the exact type matrix that `sales.transactions`
  * scan produces through Spark's JDBC path:
  *  - DATETIME → TimestampType (values exact to the second),
  *  - DECIMAL(10,2) → DecimalType(10,2),
  *  - BIGINT UNSIGNED arrives as DECIMAL(20,0) from Spark's MySQL
  *    dialect — values above Long.MaxValue must survive the engine
  *    end-to-end (staged, aggregated, written),
  *  - zero-dates arrive as NULL once `zeroDateTimeBehavior=convertToNull`
  *    is on the URL — `Readers.mysqlJdbcUrl` guarantees that — and the
  *    engine must tolerate NULL timestamps in every downstream step. */
class JdbcDialectSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private val url = "jdbc:derby:/tmp/graft_test_derby_dialect;create=true"
  private val props = new Properties()

  test("transactions schema round trip: DATETIME→timestamp, " +
       "DECIMAL(10,2), NULL timestamps (the zero-date shape)") {
    val src = Seq(
      ("txn_001", 101, "cust_a", BigDecimal("29.99"),
        java.sql.Timestamp.valueOf("2025-08-15 09:15:00")),
      ("txn_004", 104, "cust_c", BigDecimal("89.99"),
        java.sql.Timestamp.valueOf("2025-08-16 11:30:00")),
      // the zero-date row AFTER Connector/J's convertToNull mapping
      ("txn_zero", 105, "cust_d", BigDecimal("5.75"),
        null.asInstanceOf[java.sql.Timestamp]))
      .toDF("transaction_id", "product_id", "customer_id",
        "transaction_amount", "transaction_date")
      .withColumn("transaction_amount",
        org.apache.spark.sql.functions.col("transaction_amount")
          .cast(DecimalType(10, 2)))
    src.write.mode("overwrite").jdbc(url, "t_transactions", props)
    val back = graft.sources.Readers.jdbc(spark, url, "t_transactions", props)
    val byName = back.schema.fields.map(f => f.name -> f.dataType).toMap
    val idT = byName.collectFirst {
      case (n, t) if n.equalsIgnoreCase("transaction_id") => t }.get
    assert(idT == StringType, s"got $idT")
    val amt = byName.collectFirst {
      case (n, t) if n.equalsIgnoreCase("transaction_amount") => t }.get
    assert(amt == DecimalType(10, 2), s"got $amt")
    val ts = byName.collectFirst {
      case (n, t) if n.equalsIgnoreCase("transaction_date") => t }.get
    assert(ts == TimestampType, s"got $ts")
    val rows = back.collect().map(r =>
      (r.getString(0), Option(r.get(4)).map(_.toString))).toMap
    assert(rows("txn_001") == Some("2025-08-15 09:15:00.0"))
    assert(rows("txn_zero").isEmpty, "zero-date row must arrive as NULL")
    // NULL timestamps flow through downstream aggregation (na.drop is
    // the reference's own cleanse step — both paths stay usable)
    assert(back.where("transaction_date IS NULL").count() == 1)
    assert(back.na.drop(Seq("transaction_date")).count() == 2)
  }

  test("unsigned-bigint shape: DECIMAL(20,0) values above Long.MaxValue " +
       "survive scan, aggregate, and write") {
    // MySQL BIGINT UNSIGNED maps to decimal(20,0) in Spark's dialect;
    // Derby stores the same shape directly
    val big = BigDecimal("18446744073709551615") // 2^64 - 1
    val src = Seq(("a", big), ("b", BigDecimal(7)))
      .toDF("k", "counter")
      .withColumn("counter",
        org.apache.spark.sql.functions.col("counter").cast(DecimalType(20, 0)))
    src.write.mode("overwrite").jdbc(url, "t_unsigned", props)
    val back = graft.sources.Readers.jdbc(spark, url, "t_unsigned", props)
    val ct = back.schema.fields.collectFirst {
      case f if f.name.equalsIgnoreCase("counter") => f.dataType }.get
    assert(ct == DecimalType(20, 0), s"got $ct")
    val got = back.orderBy("k").collect()
      .map(_.getDecimal(1).toBigInteger.toString).toSeq
    assert(got == Seq("18446744073709551615", "7"))
    // aggregation keeps exactness (no silent long truncation)
    val s = back.agg(org.apache.spark.sql.functions.sum("counter"))
      .head().getDecimal(0).toBigInteger.toString
    assert(s == "18446744073709551622")
  }

  test("mysqlJdbcUrl appends the zero-date guard exactly once") {
    import graft.sources.Readers.mysqlJdbcUrl
    assert(mysqlJdbcUrl("jdbc:mysql://db:3306/sales") ==
      "jdbc:mysql://db:3306/sales?zeroDateTimeBehavior=convertToNull")
    assert(mysqlJdbcUrl("jdbc:mysql://db:3306/sales?useSSL=false") ==
      "jdbc:mysql://db:3306/sales?useSSL=false&zeroDateTimeBehavior=convertToNull")
    val set = "jdbc:mysql://db:3306/sales?zeroDateTimeBehavior=round"
    assert(mysqlJdbcUrl(set) == set, "caller's explicit setting wins")
  }

  test("DSv2 catalog pushes GROUP BY aggregates into the source SQL") {
    import org.apache.spark.sql.functions.{count, sum}
    val rows = (1 to 100).map(i =>
      (i.toLong, (i % 4).toLong, BigDecimal(i).setScale(2)))
      .toDF("id", "grp", "amount")
      .withColumn("amount",
        org.apache.spark.sql.functions.col("amount").cast(DecimalType(10, 2)))
    rows.write.mode("overwrite").jdbc(url, "t_push_agg", props)
    graft.sources.Readers.jdbcCatalog(spark, "srcdb", url)
    // Derby folds unquoted identifiers to upper case; the DSv2 catalog
    // looks names up verbatim
    val agg = spark.table("srcdb.APP.T_PUSH_AGG")
      .groupBy("grp").agg(count("*").as("n"), sum("amount").as("total"))
    // the aggregate reached the SCAN: group-count rows cross the wire,
    // not the table — the property that matters at 100× source size
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan.take(2000))
    assert(plan.contains("COUNT") && plan.contains("SUM"), plan.take(2000))
    val got = agg.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue())).toSet
    val expect = (1 to 100).groupBy(_ % 4).map { case (g, is) =>
      (g.toLong, is.size.toLong, is.map(_.toDouble).sum) }.toSet
    assert(got == expect)
  }
}
