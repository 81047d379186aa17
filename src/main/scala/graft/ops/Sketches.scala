package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-accelerated operators. Together with Bloom
  * (`Relational.bloomPrefilterJoin`), HLL (`approx_count_distinct`,
  * q52), MinHash and SimHash (`Dedup`), this completes the classic
  * sketch family a 100 TB engine leans on: sublinear summaries built in
  * one pass, broadcast once, probed map-side. */
object Sketches {

  /** Exact heavy hitters, CMS-accelerated: values of `keyCol` (long)
    * occurring at least `minCount` times.
    *
    * The naive formulation shuffles EVERY row into a full groupBy. This
    * one builds a Count-Min sketch in one pass (driver-side merge of
    * per-partition sketches — KBs, not data), broadcasts it, and drops
    * rows whose ESTIMATED frequency is below the threshold BEFORE the
    * shuffle (codegen'd probe, `functions.CmsEstimateLong`). CMS never
    * under-counts, so no true heavy hitter is lost; over-counted cold
    * keys survive the prefilter only to be eliminated by the exact
    * count — the result is bit-identical to `GROUP BY ... HAVING
    * count >= minCount`, but the shuffle carries only the (by
    * definition small) candidate slice. The same prefilter-then-verify
    * shape as the bloom join, pointed at aggregation. */
  def heavyHitters(df: DataFrame, keyCol: Column, minCount: Long,
                   eps: Double = 0.0001, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val keyed = df.select(keyCol.cast("long").as("key"))
    val cms = keyed.filter(col("key").isNotNull)
      .stat.countMinSketch(col("key"), eps, confidence, seed)
    val cmsB = df.sparkSession.sparkContext.broadcast(cms)
    // GROUP BY keeps the null group, and a CMS can't represent it — so
    // null keys bypass the probe INSIDE the same filter (the probe is
    // null-intolerant: null key → null estimate, and `isNull || ...`
    // short-circuits true). One scan serves hot keys and the null group;
    // the null group is a single extra map-side-combined count in the
    // shuffle, so the bit-identical GROUP BY ... HAVING contract holds
    // for nullable keys at no extra pass.
    keyed
      .filter(col("key").isNull ||
        graft.functions.CmsExpressions.estimateLong(cmsB, col("key")) >= minCount)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
