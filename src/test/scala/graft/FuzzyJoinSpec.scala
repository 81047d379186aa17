package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** fuzzySelfJoin vs in-test brute force: the prefix blocking must lose
  * NO true pair (completeness is the whole theorem) and invent none. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(df: org.apache.spark.sql.DataFrame,
                         k: Int): Set[(Long, Long)] =
    df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.s"), col("b.s")) <= k)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fuzzy(df: org.apache.spark.sql.DataFrame,
                    k: Int): Set[(Long, Long)] =
    TextAnalysis.fuzzySelfJoin(df, col("id"), col("s"), maxDist = k)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("k=1 equals brute force on a hot-stem corpus") {
    val names = (0 until 60).map(i => f"Device#$i%04d") ++
      Seq("Device#0x01", "Devize#0001", "evice#0001", "Device#00010")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    assert(fuzzy(df, 1) == bruteForce(df, 1))
    assert(fuzzy(df, 1).nonEmpty)
  }

  test("short strings pair exhaustively (below the q-gram bound)") {
    val df = Seq((1L, "ab"), (2L, "a"), (3L, "ba"), (4L, "Widget#77"))
      .toDF("id", "s")
    // "ab"~"a" dist 1, "ab"~"ba" dist 2 (excluded at k=1), "a"~"ba" dist 1
    assert(fuzzy(df, 1) == bruteForce(df, 1))
    assert(fuzzy(df, 1) == Set((1L, 2L), (2L, 3L)))
  }

  test("k=2 equals brute force (prefix widens to q*k+1)") {
    val names = Seq("alpha-node-17", "alpha-node-18", "alpha-node-81",
      "alpha-mode-17", "alpha-node-1", "beta-node-17", "alpha-node-199")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    assert(fuzzy(df, 2) == bruteForce(df, 2))
  }

  test("no pairs when everything is far apart") {
    val df = Seq((1L, "aaaaaa"), (2L, "bbbbbb"), (3L, "cccccc"))
      .toDF("id", "s")
    assert(fuzzy(df, 1).isEmpty)
  }
}
