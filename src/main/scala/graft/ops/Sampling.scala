package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Random samples
  * (`df.sample`) are seed- and partitioning-dependent — rerunning the
  * pipeline or changing the cluster layout changes the sample, which
  * poisons dataset reproducibility. These operators key every sampling
  * decision on a cryptographic hash of a stable row key instead: the
  * same row always makes the same decision, on any engine (md5 is
  * bit-identical everywhere), any partitioning, any scale.
  */
object Sampling {

  /** Hash-threshold sample: keep rows whose md5(key) 8-hex-digit prefix
    * sorts below `hexThreshold`. The kept fraction is
    * parse_hex(threshold) / 16^8 (e.g. "28f5c28f" ≈ 16%). Map-only —
    * no shuffle, no state, pushdown-friendly — so it costs one scan at
    * any data size, and the sample is a stable row property: growing
    * the dataset never changes which existing rows are kept. */
  def deterministicSample(df: DataFrame, key: Column,
                          hexThreshold: String): DataFrame =
    df.filter(substring(md5(key.cast("string")), 1, 8) < lit(hexThreshold))

  /** Deterministic train/val/test SPLIT: every row lands in exactly one
    * named bucket, decided by where its md5(key) 8-hex prefix falls in
    * the [0, 16^8) hash space — fraction boundaries become hex-string
    * thresholds compared lexicographically (lowercase hex sorts like
    * the number it encodes), so the whole assignment is ONE map-only
    * projection: no shuffle, no state, and the split is a stable row
    * property — re-running the pipeline, re-partitioning the cluster
    * or GROWING the dataset never moves an existing row between
    * splits (the leakage guarantee a train/eval boundary exists for).
    * `splits` are (name, fraction) with fractions summing to ~1; the
    * last split absorbs rounding. */
  def hashSplit(df: DataFrame, key: Column,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, "a split needs at least two buckets")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val space = math.pow(16, 8)
    val cum = splits.init.scanLeft(0.0)(_ + _._2).tail
    // Clamp to the top of the 8-hex space: a cumulative fraction that
    // rounds to exactly 16^8 would format as the 9-char '100000000',
    // which sorts BELOW most 8-char hashes and misroutes rows.
    val thresholds = cum.map(f =>
      f"${math.min(math.floor(f * space).toLong, space.toLong - 1)}%08x")
    val h = substring(md5(key.cast("string")), 1, 8)
    val bucket = splits.init.zip(thresholds).foldRight(
        lit(splits.last._1)) { case (((name, _), t), rest) =>
      when(h < lit(t), lit(name)).otherwise(rest)
    }
    df.withColumn("split", bucket)
  }

  /** Stratified fixed-size sample: exactly min(n, |stratum|) rows per
    * stratum, chosen by md5 order of the key (uniform within the
    * stratum, reproducible, engine-portable). One shuffle on the strata
    * keys; the per-stratum top-n runs map-side partial inside the
    * window exec, so only candidate rows cross the wire. */
  def stratifiedSample(df: DataFrame, strata: Seq[Column], key: Column,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(strata: _*).orderBy(md5(key.cast("string")), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Training-data MIXTURE builder: resample every source to an exact
    * target row count — the step that turns a raw corpus into a
    * weighted training mix. Downsampling keeps the md5-first `target`
    * rows of the source; with `allowRepeat`, oversampling emits whole
    * copies of the source plus an md5-first remainder (how training
    * mixes run high-quality sources for multiple "epochs"). The k-th
    * copy of a row is tagged `__epoch` = 1..k, so downstream exact
    * dedup of the MIX stays well-defined.
    *
    * `targets` is a (source, target) frame — at scale the mix spec is
    * config data, not code; a source absent from it has weight 0 and is
    * dropped. Unified copy count per row:
    *   copies = target div count + (rank <= target mod count ? 1 : 0)
    * which covers down- (div = 0) and upsampling with one formula and
    * guarantees exactly `target` output rows per source.
    *
    * Determinism and scale: rank = md5(key), so membership is a row
    * property — reproducible on any engine, any partitioning, any
    * cluster. Cost = one tiny per-source count, one broadcast join of
    * the #sources-row plan, and one RANGE-partitioned rank
    * (`Relational.groupedRank`): a `Window.partitionBy(source)` rank
    * would funnel every row of a source through ONE reducer — a
    * full-corpus sort on ≤#sources partitions, THE bottleneck at
    * 100 TB with a handful of sources — so each source's rank is
    * instead computed across many range partitions and offset by
    * broadcast per-(source, partition) prefix counts. */
  def mixture(df: DataFrame, source: Column, key: Column,
              targets: DataFrame, allowRepeat: Boolean = false): DataFrame = {
    val counts = df.groupBy(source.as("__src")).agg(count(lit(1)).as("__cnt"))
    val plan = counts
      .join(targets.toDF("__src", "__target"), Seq("__src"))
      .select(col("__src"), col("__cnt"), col("__target").cast("long")
        .as("__target"))
      // integer div/mod (expr: Column has no `div`); exact at any size
      .withColumn("__full", expr("__target div __cnt"))
      .withColumn("__rem", col("__target") % col("__cnt"))
    if (!allowRepeat) {
      val over = plan.filter(col("__target") > col("__cnt"))
        .select("__src").collect().map(_.get(0)) // bounded: #sources rows
      require(over.isEmpty,
        s"mixture targets exceed available rows for ${over.mkString(", ")}; " +
          "pass allowRepeat=true to oversample")
    }
    val joined = df.withColumn("__src", source)
      .join(broadcast(plan), Seq("__src"))
    Relational.groupedRank(joined, Seq("__src"),
        Seq(md5(key.cast("string")), key), rankCol = "__rn")
      .withColumn("__copies",
        col("__full") + when(col("__rn") <= col("__rem"), 1L).otherwise(0L))
      .filter(col("__copies") >= 1)
      // sequence(1, 0) would count DOWN; the filter guarantees >= 1
      .withColumn("__epoch", explode(sequence(lit(1L), col("__copies"))))
      .drop("__src", "__cnt", "__target", "__full", "__rem", "__rn",
        "__copies")
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): hashed n-gram
    * bag-of-words models for a TARGET distribution (the high-quality
    * slice you want more of) and the RAW distribution (everything),
    * Laplace-smoothed; each document's importance weight is
    *   log w(x) = Σ_gram [ln p̂_target(bucket(gram)) − ln p̂_raw(bucket(gram))]
    * with grams = unigrams ∪ bigrams hashed into `buckets` buckets.
    * Selection here is the paper's deterministic top-k variant (rank by
    * weight; the Gumbel-resampling variant differs only in adding noise
    * before the rank, which would break engine-portable determinism).
    *
    * Portability: the bucket hash is an md5 hex prefix (bit-identical
    * on every engine), and both model totals enter the weight once per
    * gram instance in per-(doc,bucket) grouped form — so an external
    * oracle replaying the same arithmetic matches to the 1e-6 rounding.
    *
    * Shape at scale: gram stream → per-(doc,bucket) counts is one
    * map-side-combined shuffle; the two models are ≤`buckets`-row
    * frames that join back as ONE broadcast; ranking is a single sort
    * of doc-level rows. No doc×doc, no driver state.
    *
    * Returns (doc_id, n_grams, weight, selected) — `selected` marks the
    * top floor(N·selectFrac) docs by (weight desc, doc_id). */
  def dsirWeights(docs: DataFrame, idCol: Column, text: Column,
                  isTarget: Column, buckets: Int = 1024,
                  selectFrac: Double = 0.2): DataFrame = {
    // materialized toks column: shingles' lambda re-evaluates captured
    // expressions per element, so an inline split would go quadratic
    // (see TextAnalysis.shingleSet warning)
    val grams = docs
      .select(idCol.as("doc_id"), isTarget.as("__tgt"),
        TextAnalysis.tokens(text).as("__toks"))
      .select(col("doc_id"), col("__tgt"),
        explode(concat(col("__toks"),
          TextAnalysis.shingles(col("__toks"), 2))).as("g"))
      .withColumn("b",
        conv(substring(md5(col("g")), 1, 6), 16, 10).cast("long") % buckets)
    // per-(doc,bucket) counts: shrinks the model join AND pins the
    // fp summation shape (cnt · ln(ratio), not cnt additions) so an
    // oracle replaying the same grouping is bit-comparable pre-round.
    // __tgt is a DOC property, so grouping by it too changes nothing —
    // and lets model AND totals derive from this compact frame instead
    // of re-running the gram explosion (tokenize + shingle over every
    // document) once per aggregation: the tokenization pass — the
    // dominant cost — runs exactly ONCE. persist(), not a pin:
    // nothing partition-id-dependent hangs off this frame (unlike the
    // range-partitioned rank below), so a cache-miss recompute is
    // bit-identical and the cheap lazy cache is safe.
    val docBucket = grams.groupBy(col("doc_id"), col("__tgt"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val model = docBucket.groupBy(col("b")).agg(
      sum(when(col("__tgt"), col("cnt")).otherwise(0L)).as("ct"),
      sum(col("cnt")).as("cr"))
    // corpus totals fold out of the ≤`buckets`-row model (Σ ct, Σ cr) —
    // no third pass over gram-scale data
    val totals = model.agg(
      sum(col("ct")).as("t_total"), sum(col("cr")).as("r_total"))
    val scored = docBucket
      .join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_grams"),
        sum(col("cnt") * log((col("ct") + lit(1.0)) / (col("cr") + lit(1.0))))
          .as("__s"))
      .crossJoin(broadcast(totals)) // 1 row
      .select(col("doc_id"), col("n_grams"),
        round(col("__s") + col("n_grams") *
          log((col("r_total") + lit(buckets.toDouble)) /
              (col("t_total") + lit(buckets.toDouble))), 6).as("weight"))
    // selection cut: exact global rank WITHOUT a single-partition window
    // (range-partitioned local ranks + broadcast offsets), and N from
    // the SAME offsets collect — one pin, one pass; a separate count()
    // here would re-run the whole gram pipeline (or force a second pin)
    val (ranked, n) = Relational.globalRankWithTotal(scored,
      Seq(col("weight").desc, col("doc_id")), rankCol = "__rk")
    // globalRankWithTotal eagerly pins (localCheckpoint) the scored
    // frame, cutting `ranked`'s lineage to docBucket — release the
    // cache here instead of leaking blocks for the session's lifetime
    // when dsirWeights is called repeatedly
    docBucket.unpersist(blocking = false)
    val k = lit(math.floor(selectFrac * n).toLong)
    ranked.withColumn("selected", col("__rk") <= k).drop("__rk")
  }

  /** Temperature-scaled mixture (the mT5/XLM-R multilingual sampling
    * rule): per-source targets ∝ count^(1/T), normalized to `totalN`
    * rows — T>1 upsamples small sources relative to their share, T=1
    * is proportional. Targets are computed DRIVER-side from the
    * (bounded, one row per source) count frame, summing weights in
    * sorted-source order so the floating-point total — and therefore
    * every floor()'d target — is reproducible by any engine replaying
    * the same ordered arithmetic (at T=2 the weight is `sqrt`, which
    * IEEE 754 requires correctly rounded, so the parity is exact). The
    * actual row selection is `mixture`'s md5-rank machinery:
    * deterministic, partitioning-independent, epoch-tagged repeats. */
  def temperatureMixture(df: DataFrame, source: Column, key: Column,
                         totalN: Long, temperature: Double = 2.0,
                         allowRepeat: Boolean = true): DataFrame = {
    require(temperature > 0, s"temperature $temperature")
    val counts = df.groupBy(source.as("__src")).agg(count(lit(1)).as("__cnt"))
      .collect() // bounded: one row per source
      .map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy(_._1)
    def weight(c: Long): Double =
      if (temperature == 2.0) math.sqrt(c.toDouble)
      else math.pow(c.toDouble, 1.0 / temperature)
    val total = counts.foldLeft(0.0)((acc, sc) => acc + weight(sc._2))
    val targets = counts.toSeq.map { case (s, c) =>
      (s, math.floor(totalN * weight(c) / total).toLong)
    }
    val spark = df.sparkSession
    import spark.implicits._
    mixture(df, source, key, targets.toDF("__src", "__target"), allowRepeat)
  }

  /** GPT-style sequence packing: documents are laid end-to-end (in
    * `idCol` order) into one contiguous token stream and cut into
    * fixed `blockTokens` training blocks; a document may straddle a cut
    * (concatenative packing, the standard pretraining layout). Returns
    * one row per block: how many documents touch it, how many START in
    * it, and its token fill (= blockTokens everywhere but the tail).
    *
    * Scale shape: token counts are one map-only pass; the global
    * stream offsets come from `Relational.globalPrefixSum` (range-
    * partitioned prefix sum — NO single-partition window); each doc
    * then explodes to its ⌈len/B⌉+1 touched blocks (linear in total
    * tokens / B) and one block-keyed aggregation finishes. All block
    * arithmetic is integer (`div`), so any engine computes the same
    * packing. */
  def packSequences(docs: DataFrame, idCol: Column, textCol: Column,
                    blockTokens: Long): DataFrame = {
    val b = lit(blockTokens)
    val withLen = docs.select(idCol.as("doc_id"),
      size(split(textCol, " ")).cast("long").as("n_tokens"))
    graft.ops.Relational
      .globalPrefixSum(withLen, Seq(col("doc_id")), col("n_tokens"), "cum_end")
      .withColumn("cum_start", col("cum_end") - col("n_tokens"))
      .withColumn("start_block", expr(s"cum_start div $blockTokens"))
      .withColumn("end_block", expr(s"(cum_end - 1) div $blockTokens"))
      // empty docs (cum_end == cum_start) still occupy their start block
      .withColumn("end_block", greatest(col("end_block"), col("start_block")))
      .withColumn("block_id",
        explode(sequence(col("start_block"), col("end_block"))))
      .groupBy(col("block_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("cum_start") >= col("block_id") * b).cast("long"))
          .as("n_starts"),
        sum(least(col("cum_end"), (col("block_id") + 1) * b) -
            greatest(col("cum_start"), col("block_id") * b)).as("n_tokens"))
  }

  /** Token-budget corpus selection — "the best N tokens": keep
    * documents in `order` (quality desc + an explicit tiebreak) while
    * the INCLUSIVE running token total fits `budgetTokens`. These are
    * SQL's `sum(tokens) OVER (ORDER BY ...) <= B` semantics — a
    * document that would cross the budget is dropped and so is
    * everything after it (a prefix, not a knapsack: curation wants the
    * quality ORDER preserved, not bin-packing) — so any engine derives
    * the identical keep set; token counts are integers, no float
    * accumulation at the boundary.
    *
    * Scale shape: ONE range shuffle on the order key + broadcast
    * per-partition offsets (`Relational.globalPrefixSum`) — never a
    * single-reducer global window. */
  def selectTokenBudget(docs: DataFrame, order: Seq[Column],
                        tokens: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    graft.ops.Relational
      .globalPrefixSum(docs, order, tokens, "__cum")
      .filter(col("__cum") <= budgetTokens)
      .drop("__cum")
  }
}
