package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Num

class NumSpec extends SparkSpec {
  import spark.implicits._

  test("dsum is partition-order independent and exact to 2dp") {
    // Cents-valued doubles: decimal-routed sum must equal exact integer
    // arithmetic regardless of how Spark partitions the data.
    val gen = Gen.listOfN(50, Gen.chooseNum(-100000L, 100000L))
    (1 to 10).foreach { i =>
      val cents = gen(Gen.Parameters.default, Seed(i.toLong)).get
      val xs = cents.map(_ / 100.0)
      val expected = cents.sum / 100.0
      for (parts <- Seq(1, 7)) {
        val got = spark.sparkContext.parallelize(xs, parts).toDF("x")
          .agg(Num.dsum(col("x")).as("s")).as[Double].head()
        assert(got == expected, s"seed=$i parts=$parts")
      }
    }
  }

  test("davg equals exact sum divided by count") {
    val df = Seq(1.11, 2.22, 3.34).toDF("x")
    val got = df.agg(Num.davg(col("x")).as("a")).as[Double].head()
    assert(got == 6.67 / 3)
  }
}
