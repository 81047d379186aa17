package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.pipeline.GraftLog

/** Dev-only phase profiler for the q94 graft-log pipeline (not part of
  * the driver contract). Times overwrite/upsert/compact/read+agg
  * separately across reps so a regression can be attributed to a phase. */
object ProfileQ94 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Tables.withTestdataConfs(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 4).foreach { rep =>
      println(s"rep $rep")
      val base = "/tmp/profile_q94/tbl"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/profile_q94"))
      val cust = Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          col("c_acctbal").cast(DecimalType(18, 2)).as("acctbal"))
      t("overwrite")(GraftLog.overwrite(cust, base))
      val updates = cust.filter(col("c_custkey") % 10 === 0)
        .withColumn("acctbal", (col("acctbal") + lit(100)).cast(DecimalType(18, 2)))
        .unionByName(cust.filter(col("c_custkey") < 50)
          .withColumn("c_custkey", col("c_custkey") + lit(1000000L)))
      t("upsert")(GraftLog.upsert(spark, base, updates, Seq("c_custkey")))
      t("compact")(GraftLog.compact(spark, base, targetRowsPerFile = 4096))
      t("read+agg")(GraftLog.read(spark, base)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("acctbal")).cast("double").as("total_acctbal"))
        .orderBy(col("c_nationkey")).count())
    }
    spark.stop()
  }
}
