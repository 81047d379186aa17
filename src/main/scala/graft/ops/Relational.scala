package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational completion: the operator families the reference lacks
  * entirely (SURVEY.md §2.8 — joins, windows, set ops, dedup, top-k)
  * but any real workload on its schema needs. All stock DataFrame API —
  * Catalyst supplies pushdown/pruning/join-selection/AQE.
  *
  * Scale notes (100 TB):
  *  - `broadcast()` hints are applied only to genuinely bounded
  *    dimensions (nation=25, region=5 rows at any SF). Unbounded sides
  *    go through shuffle joins where AQE picks broadcast at runtime if a
  *    side turns out small.
  *  - Window/group operators shuffle once on their partition key and
  *    reuse that partitioning for nested windows (e.g. sessionize).
  *  - Nothing collects to the driver; everything stays partition-parallel.
  */
object Relational {

  /** Broadcast-hash equi-join: replicate the (bounded) build side to every
    * executor; no shuffle of the probe side. */
  def broadcastJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys)

  /** Shuffle equi-join for two unbounded sides. AQE converts to broadcast
    * at runtime when one side's actual size is below the threshold. */
  def shuffleJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  how: String = "inner"): DataFrame =
    left.join(right, keys, how)

  /** EXISTS: keep left rows with ≥1 match. No right columns materialize,
    * and Spark short-circuits per key — cheaper than join+distinct. */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** NOT EXISTS: keep left rows with no match. */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Skew-resilient equi-join: spread a hot key across `saltBuckets`
    * shuffle partitions by salting the skewed side with a deterministic
    * hash of one of its unique columns, and replicating the other side
    * once per bucket. Use when one key holds so many rows that a single
    * shuffle partition would spill or straggle (AQE's skew-join split
    * handles moderate skew; salting handles the pathological single-key
    * case at a known replication cost of |other| × saltBuckets). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 saltBuckets: Int, skewedUnique: Column,
                 how: String = "inner"): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(hash(skewedUnique), lit(saltBuckets)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt", how).drop("__salt")
  }

  /** Adaptive skew join: detect genuinely hot keys with one map-side-
    * combined count over the skewed side, then salt ONLY those keys'
    * rows (replicating the other side's matching rows `saltBuckets`
    * ways) and plain-join everything else; union of both paths. The
    * static `saltedJoin` pays |other| × saltBuckets replication even
    * when no key is actually skewed — this pays it only for the hot
    * slice, which is the version that survives 100 TB: the hot-key set
    * is small by definition (that's what makes them hot), so it rides a
    * broadcast, and the cold path is an ordinary AQE-managed shuffle
    * join. Inner and left joins only (the skewed-side split preserves
    * exactly their semantics). */
  def skewJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
               saltBuckets: Int, skewedUnique: Column,
               hotKeyThreshold: Long = 1000000L,
               how: String = "inner",
               detectSampleFraction: Double = 1.0): DataFrame = {
    require(how == "inner" || how == "left",
      s"skewJoin preserves semantics for inner/left joins only, got $how")
    val keyCols = keys.map(col)
    // Hot-key detection may run on a sample: which keys get salted is a
    // pure performance decision (both paths compute the same join), so a
    // sampled estimate never affects the result — and at 100 TB an exact
    // per-key count over the fact table costs more than the skew it
    // prevents. The threshold scales by the fraction.
    val detectSide =
      if (detectSampleFraction >= 1.0) skewed
      else skewed.sample(withReplacement = false, detectSampleFraction, seed = 42L)
    val scaledThreshold = math.max(1L,
      (hotKeyThreshold * detectSampleFraction).toLong)
    val hot = detectSide.groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > scaledThreshold)
      .select(keyCols: _*)
      .withColumn("__hot", lit(true))
    val tagged = skewed.join(broadcast(hot), keys, "left")
    val cold = tagged.filter(col("__hot").isNull).drop("__hot")
      .join(other, keys, how)
    val hotSkewed = tagged.filter(col("__hot") === true).drop("__hot")
    // replicate only the other-side rows that belong to hot keys
    val hotOther = other.join(broadcast(hot), keys, "inner").drop("__hot")
    val saltedHot = saltedJoin(hotSkewed, hotOther, keys, saltBuckets,
      skewedUnique, how)
    cold.unionByName(saltedHot.select(cold.columns.map(col): _*))
  }

  /** Top-k rows per group, totally ordered (tiebreak keys must make the
    * ordering unique for deterministic output). Partial top-k runs
    * map-side inside the window exec after one shuffle on the group key. */
  def topKPerGroup(df: DataFrame, k: Int, partitionKeys: Seq[Column],
                   order: Seq[Column], rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(partitionKeys: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Exact GLOBAL rank (1-based, gap-free) over a total order, computed
    * WITHOUT the single-partition collapse of an un-partitioned window:
    * range-repartition on the order keys, rank locally per partition,
    * then add per-partition prefix offsets (a bounded #partitions-row
    * collect — metadata scale, like AQE's own stats). The scale-correct
    * replacement for `row_number().over(Window.partitionBy())`, whose
    * empty PARTITION BY funnels the whole dataset through one task. */
  /** Pin a range-partitioned frame for the computation's lifetime.
    * These operators MUST freeze the partitioning: the collected
    * per-partition offsets describe one concrete range partitioning,
    * and letting Spark recompute the exchange could re-sample bounds
    * and shift rows to different pids underneath them — silent wrong
    * ranks/sums. `persist()` is NOT a pin (cache eviction or executor
    * loss silently recomputes the lineage, re-sampling the bounds), so
    * this truncates lineage with an eager `localCheckpoint`: the
    * materialized blocks ARE the data from then on — a lost block
    * fails the job loudly instead of recomputing a different
    * partitioning. Cost is bounded in practice: a handful of
    * global-rank/prefix-sum calls per session, each over doc-level
    * (not token-level) rows; the checkpoint blocks are dropped with
    * the executor/session, so there is no unbounded cache growth. */
  private[ops] def pinBounded(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)

  def globalRank(df: DataFrame, order: Seq[Column],
                 rankCol: String = "rnk"): DataFrame =
    globalRankWithTotal(df, order, rankCol)._1

  /** `globalRank` plus the TOTAL row count, which falls out of the same
    * per-partition offsets collect for free (the last cumulative sum) —
    * callers needing both the ranking and N (top-frac cuts like DSIR
    * selection) must not pay a separate `count()` job over a frame this
    * size, nor pin the input twice to feed it. */
  def globalRankWithTotal(df: DataFrame, order: Seq[Column],
                          rankCol: String = "rnk"): (DataFrame, Long) = {
    // pinned: the frame feeds two jobs (offset count + final join),
    // and re-running range partitioning must not re-sample bounds
    val sorted = pinBounded(df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id()))
    val offsets = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
    val total = offsets.last._2 // cumulative after the last partition = N
    // scanLeft yields (pid_i, rows before pid_i)'s successor shifted by
    // one position: pair each pid with the cumulative count BEFORE it
    val offsetRows = offsets.sliding(2).collect {
      case Array((_, acc), (pid, _)) => (pid, acc)
    }.toSeq
    val offsetDf = df.sparkSession.createDataFrame(offsetRows)
      .toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val ranked = sorted.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(rankCol, row_number().over(w) + col("__offset"))
      .drop("__pid", "__offset")
    (ranked, total)
  }

  /** Exact PER-GROUP rank (1-based within each group) WITHOUT the
    * per-group single-task collapse of `Window.partitionBy(group)`:
    * that window hashes every row of a group through ONE reducer, so
    * with a handful of groups (training-mix sources, say) the whole
    * dataset funnels through ≤#groups tasks — a full-corpus sort on
    * almost no parallelism. Here the data is RANGE-partitioned on
    * (group, order) — a huge group spans many partitions — ranked
    * locally per (partition, group), and offset by per-(group,
    * partition) prefix counts collected driver-side (≤ #groups ×
    * #partitions rows, metadata scale, the `globalRank` shape keyed per
    * group). Group columns must be scalar (their values key a
    * driver-side map); joins back are null-safe so null groups rank
    * correctly. */
  def groupedRank(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                  rankCol: String = "rnk"): DataFrame = {
    require(groupCols.nonEmpty, "groupedRank needs ≥1 group column")
    val gs = groupCols.map(col)
    val sorted = pinBounded(df.repartitionByRange((gs ++ order): _*)
      .withColumn("__pid", spark_partition_id()))
    val counts = sorted.groupBy(col("__pid") +: gs: _*)
      .agg(count(lit(1)).as("__n"))
    val collected = counts.collect() // ≤ #groups × #partitions rows
    val g = groupCols.size
    // per group, in pid order: rows of the group in EARLIER partitions
    val offsetRows: Seq[org.apache.spark.sql.Row] = collected.toSeq
      .map(r => (r.getInt(0), Seq.tabulate(g)(i => r.get(1 + i)), r.getLong(1 + g)))
      .groupBy(_._2).toSeq.flatMap { case (gv, rows) =>
        rows.sortBy(_._1).scanLeft((0, 0L, 0L)) {
          case ((_, _, acc), (pid, _, n)) => (pid, acc, acc + n)
        }.drop(1).map { case (pid, before, _) =>
          org.apache.spark.sql.Row.fromSeq(pid +: gv :+ before)
        }
      }
    // offset-side columns renamed __og_i so the join never collides
    // with data column names
    val offsetSchema = org.apache.spark.sql.types.StructType(
      counts.schema.fields.dropRight(1).zipWithIndex.map { case (f, i) =>
        f.copy(name = if (i == 0) "__opid" else s"__og_${i - 1}")
      } :+ org.apache.spark.sql.types.StructField(
        "__offset", org.apache.spark.sql.types.LongType, nullable = false))
    import scala.jdk.CollectionConverters._
    val offsetDf = df.sparkSession.createDataFrame(
      offsetRows.asJava, offsetSchema)
    // null-safe equality on the group columns: a null group is a group
    val joinCond = ((col("__pid") === col("__opid")) +:
      groupCols.zipWithIndex.map { case (c, i) =>
        col(c) <=> col(s"__og_$i") }).reduce(_ && _)
    val w = Window.partitionBy(col("__pid") +: gs: _*).orderBy(order: _*)
    sorted.join(broadcast(offsetDf), joinCond)
      .withColumn(rankCol, row_number().over(w) + col("__offset"))
      .drop("__pid", "__opid", "__offset")
      .drop(groupCols.indices.map(i => s"__og_$i"): _*)
  }

  /** Exact DISTRIBUTED prefix sum of a long-valued column in global
    * `order`: range-partition on the order keys, window-sum within each
    * partition, then add per-partition offsets (a bounded
    * #partitions-row collect) — the same shape as `globalRank`, so no
    * single-partition window anywhere. `as` holds the INCLUSIVE prefix
    * sum (this row's value included). */
  def globalPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
                      as: String): DataFrame = {
    val sorted = pinBounded(df.withColumn("__v", value.cast("long"))
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id()))
    val offsets = sorted.groupBy(col("__pid")).agg(sum(col("__v")).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
    val offsetRows = offsets.sliding(2).collect {
      case Array((_, acc), (pid, _)) => (pid, acc)
    }.toSeq
    val offsetDf = df.sparkSession.createDataFrame(offsetRows)
      .toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(as, sum(col("__v")).over(w) + col("__offset"))
      .drop("__pid", "__offset", "__v")
  }

  /** Exact running total of a double column in decimal space (prefix sums
    * stay associative/exact → identical across engines and partitionings). */
  def runningTotal(df: DataFrame, value: Column, partitionKeys: Seq[Column],
                   order: Seq[Column], as: String, scale: Int = 2): DataFrame = {
    val w = Window.partitionBy(partitionKeys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(value.cast(DecimalType(18, scale))).over(w).cast("double"))
  }

  /** Binned band join: all pairs (l, r) with r's timestamp in
    * (l.ts − windowMicros, l.ts]. The naive formulation is a cross join
    * with a range predicate — O(|L|·|R|) pairs examined. Binning by the
    * window width turns it into an equi-join: rows join only within a
    * bin, the right side is replicated to exactly 2 bins (its own and
    * the next — any band of width w crosses at most one w-aligned
    * boundary), and the exact predicate filters bin-local candidates.
    * Shuffle cost is 2|R| + |L| rows hashed on bin id — linear, AQE
    * handles hot bins, and the same plan shape survives any time skew.
    * Both inputs need an integral microsecond column; left keeps its
    * single bin so no pair can appear twice. */
  def bandJoin(left: DataFrame, right: DataFrame, leftTsUs: String,
               rightTsUs: String, windowMicros: Long): DataFrame = {
    val w = lit(windowMicros)
    val l = left.withColumn("__bin", floor(col(leftTsUs) / w))
    val r = right.withColumn("__bin",
      explode(array(floor(col(rightTsUs) / w), floor(col(rightTsUs) / w) + 1)))
    l.join(r, "__bin")
      .filter(col(rightTsUs) <= col(leftTsUs) &&
        col(rightTsUs) > col(leftTsUs) - w)
      .drop("__bin")
  }

  /** Backward as-of join: attach to each left row the latest right row of
    * the same key with right.ts <= left.ts (inclusive). Spark has no
    * native as-of operator; the naive formulation (range join + per-key
    * max) explodes quadratically on busy keys. This one is a single
    * shuffle on the key: tag both sides, union, and carry right-side
    * values forward with last(ignoreNulls) over one (key, ts, side)
    * window — right rows sort before left rows at equal ts, giving
    * inclusive semantics. O(n log n) per partition, no replication;
    * the same plan shape survives any key cardinality or skew profile.
    *
    * `valueCols` are taken from `right` and emitted as `asof_<name>`
    * (null where no right row precedes). Left/right may have further
    * columns; only left's survive. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val outCols = leftCols ++ valueCols.map("asof_" + _)
    val l = valueCols.foldLeft(left.withColumn("__side", lit(1))) { (df, c) =>
      df.withColumn(s"asof_$c", lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right.select((Seq(keyCol, tsCol) ++ valueCols).distinct.map(col): _*)
    val r1 = valueCols.foldLeft(r0) { (df, c) =>
      df.withColumn(s"asof_$c", col(c))
    }.withColumn("__side", lit(0))
    val r = leftCols.filterNot(c => c == keyCol || c == tsCol).foldLeft(r1) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val sel = (outCols :+ "__side").map(col)
    val unioned = l.select(sel: _*).unionByName(r.select(sel: _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** Forward as-of join: attach to each left row the EARLIEST right row of
    * the same key with right.ts >= left.ts (inclusive) — the mirror of
    * `asOfJoin` (same single-shuffle union+window formulation; see its
    * scaladoc for why this beats a range join at scale). The fill runs
    * backward: first(ignoreNulls) over [currentRow, unboundedFollowing],
    * with left rows sorting before right rows at equal ts so an exact
    * timestamp match is taken. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val outCols = leftCols ++ valueCols.map("asof_" + _)
    val l = valueCols.foldLeft(left.withColumn("__side", lit(0))) { (df, c) =>
      df.withColumn(s"asof_$c", lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right.select((Seq(keyCol, tsCol) ++ valueCols).distinct.map(col): _*)
    val r1 = valueCols.foldLeft(r0) { (df, c) =>
      df.withColumn(s"asof_$c", col(c))
    }.withColumn("__side", lit(1))
    val r = leftCols.filterNot(c => c == keyCol || c == tsCol).foldLeft(r1) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val sel = (outCols :+ "__side").map(col)
    val unioned = l.select(sel: _*).unionByName(r.select(sel: _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", first(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 0).drop("__side")
  }

  /** Bloom-prefiltered join — the runtime-filter pattern Spark applies
    * internally for shuffle joins, made explicit so it also covers cases
    * the planner can't prove: build a Bloom filter over the (already
    * reduced) dim side's join keys, broadcast it, and drop fact rows
    * that cannot match BEFORE the join's shuffle. At 100 TB this is the
    * difference between shuffling the full fact table and shuffling only
    * the ~selectivity × |fact| rows that survive the filter (+fpp noise);
    * the bloom itself stays small (~1.2 MB per million keys at 1% fpp).
    * False positives are eliminated by the join itself, so for join types
    * where unmatched fact rows are dropped anyway the result is
    * bit-identical to the plain join — which is why `how` is restricted
    * to inner / left_semi: an outer join would emit unmatched fact rows
    * with null dim columns, and the prefilter would silently drop them.
    * Long keys only (covers every key column in the schema); the probe is
    * a codegen'd Catalyst expression over a broadcast value
    * (`functions.BloomMightContainLong`) — partition-parallel, fused into
    * the scan's WholeStageCodegen span, no driver loop, no UDF boxing. */
  def bloomPrefilterJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                         dimKey: String, expectedDimKeys: Long,
                         fpp: Double = 0.01, how: String = "inner"): DataFrame = {
    val norm = how.toLowerCase.replace("_", "")
    require(norm == "inner" || norm == "leftsemi" || norm == "semi",
      s"bloomPrefilterJoin preserves semantics only for inner/left_semi " +
        s"joins (the prefilter drops unmatched fact rows an outer join " +
        s"would keep), got '$how'")
    val bf = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    val bfB = fact.sparkSession.sparkContext.broadcast(bf)
    fact.filter(col(factKey).isNotNull &&
        graft.functions.BloomExpressions.mightContainLong(bfB, col(factKey)))
      .join(dim, col(factKey) === col(dimKey), how)
  }

  /** Gap-based sessionization (batch): a new session starts when the gap
    * to the previous event of the same key exceeds `gapMicros`. Both the
    * lag and the running session counter reuse ONE hash partitioning on
    * the key — a single shuffle end-to-end, which is the property that
    * survives a 1000-executor scale-up.
    *
    * Expects an integral microsecond column `tsUs`; emits `session_id`
    * (1-based per key). */
  def sessionize(df: DataFrame, key: Column, tsUs: Column, orderTiebreak: Column,
                 gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsUs, orderTiebreak)
    val isNew = when(
      lag(tsUs, 1).over(w).isNull ||
        tsUs - lag(tsUs, 1).over(w) > gapMicros, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
