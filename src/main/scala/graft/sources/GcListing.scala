package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed file listing + reaping for the GC paths (Delta VACUUM,
  * Iceberg remove_orphan_files). At 100 TB a table root holds 10⁶–10⁷
  * files; a driver-recursive walk serializes the listing on one node
  * and pins every path string in driver memory. Above
  * [[fanoutThreshold]] the walk runs as a Spark job: the driver
  * expands the directory tree only until the frontier is wide enough
  * to spread, then each task walks its own subtree — the same
  * executor-side `TableIO.current` resolution the manifest-decode
  * fan-out (IcebergInterop.snapshot) already relies on. The orphan
  * decision itself becomes a distributed anti-join at the call sites
  * (delta-spark's own VACUUM shape), so neither the candidate list nor
  * the live set ever funnels through a driver loop. */
private[sources] object GcListing {

  /** Live-file count at or above which GC fans listing, diff and
    * deletion over executors; below it job-submission overhead exceeds
    * the walk. */
  def fanoutThreshold(spark: SparkSession): Int =
    spark.conf.getOption("graft.gc.fanout").map(_.toInt).getOrElse(1000)

  /** List a directory into (subdir paths, (file absNorm path, mtime)),
    * applying the skip rules. Runs on driver AND executors. */
  private def expand(d: String, skipDirs: Set[String], skipHidden: Boolean)
      : (Seq[String], Seq[(String, Long)]) = {
    val io = TableIO()
    val names = io.list(d).filter(n =>
      !skipHidden || !(n.startsWith(".") || n.startsWith("_")))
    val (dirs, files) = names.map(TableIO.join(d, _)).partition(io.isDirectory)
    (dirs.filterNot(x => skipDirs.contains(PathCodec.absNorm(x))),
      files.map(f => (PathCodec.absNorm(f), io.lastModified(f))))
  }

  /** Every file under `root` as (absNorm path, mtime), skipping whole
    * subtrees whose absNorm path is in `skipDirs` and, when
    * `skipHidden`, any `.`/`_`-prefixed name (dir or file) at any
    * level. The listing distributes: driver work is O(top-level dirs),
    * the deep recursion runs in executor tasks. */
  def listFiles(spark: SparkSession, root: String,
                skipDirs: Set[String],
                skipHidden: Boolean): Dataset[(String, Long)] = {
    import spark.implicits._
    // widen the frontier on the driver just far enough to spread the
    // subtree walks; files met during the expansion are carried over
    val want = spark.sparkContext.defaultParallelism * 4
    var frontier = Seq(PathCodec.absNorm(root))
      .filterNot(skipDirs.contains)
    val seed = Seq.newBuilder[(String, Long)]
    var canExpand = frontier.nonEmpty
    while (canExpand && frontier.size < want) {
      val step = frontier.map(expand(_, skipDirs, skipHidden))
      seed ++= step.flatMap(_._2)
      frontier = step.flatMap(_._1)
      canExpand = frontier.nonEmpty
    }
    val (sd, sh) = (skipDirs, skipHidden)
    val deep = spark.createDataset(frontier)
      .repartition(math.max(1, math.min(frontier.size,
        spark.sparkContext.defaultParallelism * 2)))
      .flatMap { d =>
        def walk(dir: String): Seq[(String, Long)] = {
          val (dirs, files) = expand(dir, sd, sh)
          files ++ dirs.flatMap(walk)
        }
        walk(d)
      }
    spark.createDataset(seed.result()).union(deep)
  }

  /** Delete `paths` from executors (or just echo them when `dryRun`),
    * returning the table-relative reclaimed list, sorted — the same
    * audit contract the driver walks return. Paths a concurrent actor
    * already removed (delete returns false) are excluded. */
  def reap(spark: SparkSession, root: String, paths: Dataset[String],
           dryRun: Boolean): Seq[String] = {
    import spark.implicits._
    val dry = dryRun
    paths.mapPartitions { it =>
      val io = TableIO()
      it.filter(p => dry || io.delete(p))
    }.collect().toSeq
      .map(_.stripPrefix(PathCodec.absNorm(root)).stripPrefix("/"))
      .sorted
  }
}
