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
    * the #sources-row plan, and ONE window shuffle on source. */
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
    val w = Window.partitionBy(col("__src"))
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("__src", source)
      .join(broadcast(plan), Seq("__src"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__copies",
        col("__full") + when(col("__rn") <= col("__rem"), 1L).otherwise(0L))
      .filter(col("__copies") >= 1)
      // sequence(1, 0) would count DOWN; the filter guarantees >= 1
      .withColumn("__epoch", explode(sequence(lit(1L), col("__copies"))))
      .drop("__src", "__cnt", "__target", "__full", "__rem", "__rn",
        "__copies")
  }
}
