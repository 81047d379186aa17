package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** JSONL is the 100 TB JSON shape: it splits at newlines, so ONE large
  * file fans out across executors, while a multiLine (pretty-printed)
  * file is a single unsplittable task no matter its size. The spec pins
  * the parallelism difference and value parity. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("body", StringType)))

  test("jsonl splits one large file into multiple tasks; multiLine cannot") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_").toFile
    dir.deleteOnExit()
    val rows = (0L until 4000L).map(i =>
      s"""{"id":$i,"body":"${"x" * 100}"}""")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir.getPath, "docs.jsonl"),
      rows.mkString("", "\n", "\n"))
    // ~420 KB file; with 64 KB split targets a SPLITTABLE source must
    // fan out
    val prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
    try {
      val df = Readers.jsonl(spark, s"${dir.getPath}/docs.jsonl", schema)
      assert(df.rdd.getNumPartitions > 1,
        s"jsonl read planned ${df.rdd.getNumPartitions} task(s) — not splittable?")
      assert(df.count() == 4000)
      assert(df.agg(sum("id")).head().getLong(0) == (0L until 4000L).sum)

      // the parity reader on the same bytes: one task however large
      // (every byte of a multiLine document may belong to one record)
      val ml = Readers.json(spark, s"${dir.getPath}/docs.jsonl", schema,
        multiLine = true)
      assert(ml.rdd.getNumPartitions == 1)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prior)
  }

  test("jsonl and the multiLine reader agree on values") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_par_").toFile
    dir.deleteOnExit()
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir.getPath, "d.jsonl"),
      """{"id":1,"body":"a"}""" + "\n" + """{"id":2,"body":"b"}""" + "\n")
    val got = Readers.jsonl(spark, s"${dir.getPath}/d.jsonl", schema)
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
    // the same rows as a pretty-printed ARRAY need the parity reader
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir.getPath, "d_pretty.json"),
      "[\n  {\"id\": 1, \"body\": \"a\"},\n  {\"id\": 2, \"body\": \"b\"}\n]\n")
    val pretty = Readers.json(spark, s"${dir.getPath}/d_pretty.json", schema)
      .as[(Long, String)].collect().sorted.toSeq
    assert(pretty == got)
  }
}
