package graft
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import org.apache.spark.sql.SparkSession

object Bench {

  /** Run one query with a hard wall-clock ceiling: the query executes in
    * its own thread under a named job group, and on timeout the group's
    * Spark jobs are cancelled so a hung query cannot stall the rest of
    * the bench (or outlive its time slot and pollute later timings). */
  private def runCapped(spark: SparkSession, name: String,
                        body: () => Unit, capSeconds: Long): Unit = {
    val pool = Executors.newSingleThreadExecutor()
    val fut = pool.submit(new Runnable {
      def run(): Unit = {
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try body() finally spark.sparkContext.clearJobGroup()
      }
    })
    try fut.get(capSeconds, TimeUnit.SECONDS)
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(name)
        System.err.println(s"[bench] $name exceeded ${capSeconds}s - cancelled")
      case e: Throwable =>
        // a rep that THROWS would otherwise record a ~0s "time" for
        // whatever ran before the throw — q212's clone registration
        // refusal hid exactly this way. Keep the run alive (one broken
        // query must not zero the round's bench) but say so loudly.
        System.err.println(s"[bench] $name FAILED: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
    } finally pool.shutdownNow()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val cap = sys.env.getOrElse("SPARK_GRAFT_QUERY_CAP_S", "240").toLong
    val spark = graft.Tables.withTestdataConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest SF: pays JVM/codegen/class-loading
    // cost (~60s cold) once, so timed numbers measure the queries, not
    // JIT warmup. Steady-state is what a long-lived cluster session sees.
    // SPARK_GRAFT_BENCH_ONLY=q01,q44: time a named subset (the sf1
    // headline spot-check) — exact name or name-prefix match
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val benchQueries = only match {
      case None => SparkEntry.queries
      case Some(sel) => SparkEntry.queries.filter { case (name, _) =>
        sel.exists(p => name == p || name.startsWith(p + "_")) }
    }
    val warmDir = "/root/testdata/sf0.001"
    benchQueries.foreach { case (name, fn) =>
      runCapped(spark, s"warm_$name", () => { fn(spark, warmDir).count(); () }, cap)
    }
    // Compact warmup garbage BEFORE timing starts: on this VM a
    // ParallelGC full collection is a 25-40s page-fault storm (see
    // build.sbt), and without this it lands inside the first timed
    // queries (round-1 driver bench: first ~10 queries inflated 10-30x).
    System.gc()
    // Min of N timed runs per query: this VM suffers kernel page-fault
    // storms that can inflate ANY query 5-10x at random (see build.sbt
    // GC notes; profiled: a pure-map query at 0.15s jumped to 1.2s run
    // to run with zero code change). The min is the steady-state cost —
    // the number that actually predicts cluster behavior.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // Session cache hygiene between warmup and the timed sweep: a few
    // query fns persist/cache intermediates their own lazy result still
    // needs when the harness finally acts on it, so they cannot
    // unpersist before returning — without a sweep here the warmup
    // pass's cached blocks (and their CacheManager plan entries, which
    // EVERY later query's planning walks in useCachedData) carry into
    // the timed region as dead weight and GC pressure.
    spark.catalog.clearCache()
    val repTimes = benchQueries.map { case (name, fn) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        runCapped(spark, name, () => { fn(spark, sfDir).count(); () }, cap)
        (System.nanoTime() - t0) / 1e9
      }
      // between QUERIES, not between reps: rep-to-rep behavior (and
      // thus comparability with every earlier round's numbers) is
      // unchanged; only the cross-query accumulation is capped at one
      // query's worth of cached state.
      spark.catalog.clearCache()
      name -> ts
    }
    val results = repTimes.map { case (name, ts) => name -> ts.min }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Locale.ROOT: a de_DE/fr_FR default JVM locale would print "31,300"
    // — invalid JSON, the exact parse failure the compact line exists to
    // prevent.
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Full per-query map goes to STDERR and a file; the driver keeps only a
    // 2000-char stdout TAIL, and at 93 queries the full line is ~6 KB — its
    // head (`{"metric":...`) gets truncated away and the parse fails
    // (BENCH_r02.json: parsed:null). So stdout carries exactly ONE compact
    // line: total + the slowest queries that fit a ~1600-char budget.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // Every rep, not just the min: lets a reader separate this VM's
    // page-fault variance (one inflated rep, others steady) from a real
    // regression (all reps slower) without re-running anything.
    val repQs = repTimes.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$fullQs,"reps":$repQs,"sf":"$sfDir"}"""
    System.err.println(s"[bench-full] $fullLine")
    try Files.writeString(Paths.get("bench_full.json"), fullLine + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] bench_full.json write failed: $e") }

    val slowestFirst = results.toSeq.sortBy(-_._2)
    val budget = 1600
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    slowestFirst.foreach { case (k, v) =>
      val p = "\"" + k + "\":" + fmt(v)
      if (used + p.length + 1 <= budget) { parts += p; used += p.length + 1 }
    }
    val compactQs = parts.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$compactQs,"queries_total":${results.size},"queries_shown":${parts.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
