package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoin keeps only matched left rows, no right columns") {
    val left = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val right = Seq(Tuple1(1), Tuple1(3), Tuple1(3)).toDF("k")
    val got = Relational.semiJoin(left, right, Seq("k"))
    assert(got.columns.toSeq == Seq("k", "v"))
    assert(got.select("k").as[Int].collect().sorted.toSeq == Seq(1, 3))
  }

  test("antiJoin keeps only unmatched left rows") {
    val left = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val right = Seq(Tuple1(1), Tuple1(3)).toDF("k")
    val got = Relational.antiJoin(left, right, Seq("k"))
    assert(got.select("k").as[Int].collect().toSeq == Seq(2))
  }

  test("topKPerGroup returns k best rows per group in rank order") {
    val df = Seq(
      ("g1", 1L, 10.0), ("g1", 2L, 30.0), ("g1", 3L, 20.0),
      ("g2", 4L, 5.0)).toDF("g", "id", "score")
    val got = Relational.topKPerGroup(df, 2, Seq(col("g")),
      Seq(col("score").desc, col("id")))
      .select("g", "id", "rnk").as[(String, Long, Int)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(("g1", 2L, 1), ("g1", 3L, 2), ("g2", 4L, 1)))
  }

  test("runningTotal computes exact ordered prefix sums") {
    val df = Seq(("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3))
      .toDF("g", "id", "x")
    val got = Relational.runningTotal(df, col("x"), Seq(col("g")),
      Seq(col("id")), "run")
      .orderBy("id").select("run").as[Double].collect().toSeq
    assert(got == Seq(0.1, 0.3, 0.6)) // exact via decimal, no fp drift
  }

  test("saltedJoin equals the plain join, including a hot key") {
    val left = (1 to 50).map(i => (if (i <= 40) 1 else i, i.toLong))
      .toSeq.toDF("k", "id") // key 1 holds 80% of rows
    val right = Seq((1, "hot"), (45, "cold"), (99, "nomatch")).toDF("k", "tag")
    val plain = left.join(right, Seq("k"))
      .select("k", "id", "tag").as[(Int, Long, String)].collect().toSet
    val salted = Relational.saltedJoin(left, right, Seq("k"),
      saltBuckets = 4, skewedUnique = col("id"))
      .select("k", "id", "tag").as[(Int, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 1) == 40)
  }

  test("asOfJoin picks the latest right row at-or-before each left ts") {
    val clicks = Seq((1L, 100L, "c1"), (1L, 200L, "c2"), (1L, 50L, "c0"),
      (2L, 100L, "c3")).toDF("k", "ts", "name")
    val quotes = Seq((1L, 60L, 600L), (1L, 100L, 1000L), (1L, 150L, 1500L),
      (3L, 10L, 99L)).toDF("k", "ts", "px")
    val got = Relational.asOfJoin(clicks, quotes, "k", "ts", Seq("px"))
      .select("name", "asof_px").as[(String, Option[Long])]
      .collect().toMap
    assert(got == Map(
      "c0" -> None,          // no quote at/before 50
      "c1" -> Some(1000L),   // inclusive: quote AT 100 wins over 60
      "c2" -> Some(1500L),   // latest at/before 200
      "c3" -> None))         // key 2 has no quotes
  }

  test("sessionize splits on gaps > threshold per key") {
    val us = 1000000L
    val df = Seq(
      (1L, 10L, 0L * us), (1L, 11L, 60L * us), (1L, 12L, 2000L * us),
      (2L, 20L, 0L * us))
      .toDF("user_id", "event_id", "ts_us")
    val got = Relational.sessionize(df, col("user_id"), col("ts_us"),
      col("event_id"), gapMicros = 1000L * us)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 2L), (2L, 20L, 1L)))
  }

  test("groupedRank equals the per-group window rank, incl. a null group") {
    // groups of very different sizes + a null group; ranks must match the
    // single-task Window.partitionBy formulation exactly
    val rows = (1 to 500).map(i => (Some("big"), i.toLong)) ++
      (1 to 3).map(i => (Some("small"), i.toLong)) ++
      Seq((None: Option[String], 7L), (None, 3L))
    val df = rows.toDF("src", "v")
    val got = Relational.groupedRank(df, Seq("src"),
        Seq(md5(col("v").cast("string")), col("v")), "rk")
      .select("src", "v", "rk").as[(Option[String], Long, Long)]
      .collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(md5(col("v").cast("string")), col("v"))
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .as[(Option[String], Long, Long)].collect().toSet
    assert(got == want)
  }

  test("globalRankWithTotal returns the exact N alongside the ranking") {
    val df = (1 to 123).map(_.toLong).toDF("v")
    val (ranked, n) = Relational.globalRankWithTotal(df, Seq(col("v").desc), "rk")
    assert(n == 123L)
    val got = ranked.as[(Long, Long)].collect().toMap
    assert(got(123L) == 1L && got(1L) == 123L && got.values.toSet.size == 123)
  }
}
