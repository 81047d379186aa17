package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** temperatureMixture sampling-rule properties (q175 hash-checks the
  * exact chosen rows against the SQL replay). */
class TemperatureMixSpec extends SparkSpec {
  import spark.implicits._

  // 100 'big' rows vs 4 'small' rows
  private def corpus = (
    (1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 104).map(i => (i.toLong, "small"))
    ).toDF("id", "src")

  test("T=2 upsamples the small source beyond its share") {
    val got = Sampling.temperatureMixture(corpus, col("src"), col("id"),
        totalN = 52L)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // weights sqrt(100)=10, sqrt(4)=2 → targets floor(52*10/12)=43,
    // floor(52*2/12)=8: small gets 2/12 of rows vs 4/104 of corpus
    assert(got == Map("big" -> 43L, "small" -> 8L))
  }

  test("T=1 is proportional; epochs tag oversampled copies") {
    val got = Sampling.temperatureMixture(corpus, col("src"), col("id"),
        totalN = 208L, temperature = 1.0)
      .groupBy("src").agg(count(lit(1)).as("n"), max("__epoch").as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("big", 200L, 2L), ("small", 8L, 2L)))
  }
}
