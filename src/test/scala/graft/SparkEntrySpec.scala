package graft

/** Smoke: the driver contract holds — entry() yields rows, every declared
  * query runs at the smallest SF, and every query has oracle SQL (or is
  * knowingly rows-only). */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns a non-empty schema at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.nonEmpty, name)
      df.count() // forces execution
    }
  }

  test("oracle coverage: every oracleSql key is a declared query") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracleSql without query: $undeclared")
  }
}
