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
}
