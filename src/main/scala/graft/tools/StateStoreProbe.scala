package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-bench for the streaming state-store choice: times the three
  * state-store-bound queries (windowed agg, stream-stream join, hopping
  * window) at sf0.1 under whichever provider
  * `SPARK_GRAFT_STATESTORE` selects (unset = Spark's default
  * HDFS-backed in-memory store; "rocksdb" = RocksDBStateStoreProvider
  * via EventStreams.drainAvailableNow). Run once per provider and
  * compare — the winner's evidence is recorded in BASELINE.md. */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.withTestdataConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = Seq("q50_stream_window", "q64_stream_stream_join", "q80_hopping_window")
    val mode = sys.env.getOrElse("SPARK_GRAFT_STATESTORE", "default")
    qs.foreach(n => graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    qs.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[$mode] $n: " +
        times.map(t => f"$t%.2f").mkString(", ") + f" (min ${times.min}%.2f)")
    }
    spark.stop()
  }
}
