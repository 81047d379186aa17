package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler (dev tool, not part of the driver contract).
  *
  * Usage: runMain graft.Timing [queryName ...]
  * Env: SF_DIR (default sf0.1), CPUS (default 4, bench parity),
  *      EXPLAIN=1 to dump the formatted physical plan, REPS (default 3).
  */
object Timing {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("CPUS", "4")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val spark = graft.Tables.withTestdataConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.get("EXPLAIN").contains("1")) {
        println(s"===== $name plan =====")
        fn(spark, sfDir).explain("formatted")
      }
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$name run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
