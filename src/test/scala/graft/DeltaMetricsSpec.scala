package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.DeltaInterop

/** `commitInfo.operationMetrics` (delta-spark's audit surface),
  * derived from the commit's own actions at the writeCommit funnel —
  * metadata-only, no reads. numOutputRows appears only when every add
  * carries stats (absent beats wrong). */
class DeltaMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_dmetrics_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def metricsOf(base: String, version: Long): Map[String, String] = {
    val f = new File(s"$base/_delta_log/%020d.json".format(version))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    scala.io.Source.fromFile(f).getLines().flatMap { l =>
      Option(mapper.readTree(l).get("commitInfo"))
        .flatMap(ci => Option(ci.get("operationMetrics")))
    }.toSeq.headOption.map { om =>
      import scala.jdk.CollectionConverters._
      om.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty)
  }

  test("write/append/optimize commits carry exact counts") {
    val base = freshBase("basic")
    DeltaInterop.overwrite(
      (0L until 100L).toDF("id").repartition(2), base)
    val m0 = metricsOf(base, 0L)
    assert(m0("numFiles") == "2" && m0("numOutputRows") == "100", m0)
    assert(m0("numRemovedFiles") == "0")
    assert(m0("numOutputBytes").toLong > 0)
    DeltaInterop.append((100L until 130L).toDF("id").coalesce(1), base)
    val m1 = metricsOf(base, 1L)
    assert(m1("numFiles") == "1" && m1("numOutputRows") == "30", m1)
    DeltaInterop.optimize(spark, base)
    val m2 = metricsOf(base, 2L)
    assert(m2("numFiles") == "1" && m2("numRemovedFiles") == "3", m2)
    assert(m2("numOutputRows") == "130")
    // history surfaces the row count
    val hist = DeltaInterop.history(spark, base)
      .select("version", "num_output_rows")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(hist(0L).contains(100L) && hist(1L).contains(30L))
  }
}
