package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Num.davg
import graft.pipeline.Medallion
import graft.sources.Readers

/** End-to-end reproduction of the reference's three pipelines on its own
  * seed fixtures (SURVEY.md §5: 6 products / 6 transactions / 3 users),
  * asserting the hand-computable golden gold-layer outputs. */
class MedallionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("medallion").toString
  private val fixedTs = to_timestamp(lit("2025-08-20 12:00:00"))

  // data/products.csv:2-7
  private lazy val products = Seq(
    (101, "Laptop", "Electronics", 1200.00, "2025-08-10 10:00:00"),
    (102, "Mouse", "Electronics", 25.50, "2025-08-10 10:05:00"),
    (103, "Desk Chair", "Furniture", 150.00, "2025-08-11 09:30:00"),
    (104, "Standing Desk", "Furniture", 320.00, "2025-08-11 09:35:00"),
    (105, "Monitor", "Electronics", 200.00, "2025-08-12 14:00:00"),
    (106, "Bookshelf", "Furniture", 85.99, "2025-08-12 14:10:00"))
    .toDF("product_id", "product_name", "category", "price", "last_updated")

  // db/init.sql:12-18
  private lazy val transactions = Seq(
    ("T001", 101, "C001", 1200.00, "2025-08-15 10:00:00"),
    ("T002", 102, "C002", 25.50, "2025-08-15 11:00:00"),
    ("T003", 103, "C001", 150.00, "2025-08-15 12:00:00"),
    ("T004", 104, "C003", 320.00, "2025-08-16 09:00:00"),
    ("T005", 105, "C002", 200.00, "2025-08-16 10:00:00"),
    ("T006", 106, "C003", 85.99, "2025-08-16 11:00:00"))
    .toDF("transaction_id", "product_id", "customer_id",
      "transaction_amount", "transaction_date")

  test("product pipeline: bronze → silver → gold category summary") {
    val bronze = Medallion.toBronze(products, "csv", "products", fixedTs)
    val silver = Medallion.toSilver(bronze,
      moneyCols = Seq("price"), lowercaseCols = Seq("category"))
    val gold = Medallion.toGold(silver,
      Seq(col("category")),
      Seq(count(col("product_id")).cast("long").as("product_count"),
        davg(col("price").cast("double")).as("average_price")))
      .orderBy("category")
    val got = gold.as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("electronics", 3L, (1200.00 + 25.50 + 200.00) / 3),
      ("furniture", 3L, (150.00 + 320.00 + 85.99) / 3)))
  }

  test("transactions pipeline: daily sales summary matches hand computation") {
    val bronze = Medallion.toBronze(transactions, "mysql", "transactions", fixedTs)
    val silver = Medallion.toSilver(bronze,
      moneyCols = Seq("transaction_amount"),
      requiredCols = Seq("transaction_amount", "transaction_date"))
    val gold = Medallion.toGold(
      silver.withColumn("tx_date", to_date(col("transaction_date"))),
      Seq(col("tx_date")),
      Seq(sum(col("transaction_amount")).cast("double").as("total_amount"),
        count(col("transaction_id")).as("transaction_count")))
      .orderBy("tx_date")
    val got = gold.select(col("tx_date").cast("string"),
      col("total_amount"), col("transaction_count"))
      .as[(String, Double, Long)].collect().toSeq
    // SURVEY.md §5: 2025-08-15 → 1375.50/3, 2025-08-16 → 605.99/3
    assert(got == Seq(
      ("2025-08-15", 1375.50, 3L),
      ("2025-08-16", 605.99, 3L)))
  }

  test("silver na.drop removes rows with nulls in required columns") {
    val withNull = transactions.unionAll(
      Seq(("T007", 107, "C004",
        null.asInstanceOf[java.lang.Double], "2025-08-17 09:00:00"))
        .toDF("transaction_id", "product_id", "customer_id",
          "transaction_amount", "transaction_date")
        .withColumn("transaction_amount", col("transaction_amount").cast("double")))
    val silver = Medallion.toSilver(withNull,
      moneyCols = Seq("transaction_amount"),
      requiredCols = Seq("transaction_amount"))
    assert(silver.count() == 6)
    assert(silver.columns.contains("data_quality_check"))
  }

  test("write, partitioned write, verify round-trip, and catalog registration") {
    val bronze = Medallion.toBronze(products, "csv", "products", fixedTs)
      .withColumn("ingestion_date", lit("2025-08-20"))
    assert(Medallion.writeAndVerify(bronze, s"$tmp/bronze_products") == 6L)
    Medallion.writePartitioned(bronze, s"$tmp/silver_products",
      Seq("ingestion_date"))
    val back = Readers.parquet(spark, s"$tmp/silver_products")
    assert(back.count() == 6)
    assert(back.columns.contains("ingestion_date")) // partition col readable

    Medallion.writeSingleFile(
      bronze.groupBy("category").count(), s"$tmp/gold_products")
    Medallion.registerExternal(spark, "graft_gold", "product_summary",
      s"$tmp/gold_products")
    assert(Readers.table(spark, "graft_gold", "product_summary").count() == 2)
  }
}

/** Source readers over reference-shaped fixture files (SURVEY.md §2.1). */
class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("readers").toString

  test("S1 csv scan with header + inferSchema") {
    Files.writeString(java.nio.file.Path.of(s"$tmp/products.csv"),
      "product_id,product_name,price\n101,Laptop,1200.0\n102,Mouse,25.5\n")
    val df = Readers.csvInferred(spark, s"$tmp/products.csv")
    assert(df.schema("product_id").dataType == IntegerType)
    assert(df.count() == 2)
  }

  test("S2 multiLine json array with explicit schema (reference users.json shape)") {
    Files.writeString(java.nio.file.Path.of(s"$tmp/users.json"),
      """[
        |    {"id": 1, "first_name": "John", "created_at": "2025-07-01T12:00:00"},
        |    {"id": 2, "first_name": "Jane", "created_at": "2025-08-02T08:30:00"}
        |]""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("first_name", StringType),
      StructField("created_at", TimestampType)))
    val df = Readers.json(spark, s"$tmp/users.json", schema)
    assert(df.count() == 2)
    assert(df.filter(col("created_at").isNull).count() == 0)
  }

  test("S3 native xml scan with rowTag (reference weather.xml shape)") {
    Files.writeString(java.nio.file.Path.of(s"$tmp/weather.xml"),
      """<observations>
        |  <observation><station_id>S1</station_id><temperature>21.5</temperature></observation>
        |  <observation><station_id>S2</station_id><temperature>19.0</temperature></observation>
        |</observations>""".stripMargin)
    val df = Readers.xml(spark, s"$tmp/weather.xml", "observation")
    assert(df.count() == 2)
    assert(df.select("station_id").as[String].collect().sorted.toSeq
      == Seq("S1", "S2"))
  }

  test("S6 parquet with explicit schema reads back a declared subset") {
    Seq((1L, "a", 2.0)).toDF("k", "s", "x")
      .write.mode("overwrite").parquet(s"$tmp/subset")
    val df = Readers.parquet(spark, s"$tmp/subset",
      StructType(Seq(StructField("k", LongType), StructField("x", DoubleType))))
    assert(df.columns.toSeq == Seq("k", "x"))
    assert(df.as[(Long, Double)].head() == ((1L, 2.0)))
  }
}
