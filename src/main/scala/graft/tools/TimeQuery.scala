package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query wall-clock probe: warm at sf0.001, then time N reps of
  * one SparkEntry query at the given SF dir under the bench session
  * config. `runMain graft.tools.TimeQuery q111_dedup_clusters
  * /root/testdata/sf0.1 [reps]` — the per-query magnifier next to
  * Bench's full sweep (min-of-reps is the number to read; this VM's
  * page-fault storms inflate single runs 5-10x at random). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q111_dedup_clusters")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.Tables.withTestdataConfs(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // JIT/codegen warmup
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"$name at $dir: $n rows, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
