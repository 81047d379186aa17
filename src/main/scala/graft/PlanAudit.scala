package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: audit every declared query's physical plan for scale
  * anti-patterns (nested-loop/cartesian joins, missing pushdown). Run:
  * `sbt "runMain graft.PlanAudit [sfDir]"`. Not part of the driver
  * contract; kept in-tree because plan hygiene is a per-round check. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Tables.withTestdataConfs(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val bad = Seq(
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "CartesianProduct" -> plan.contains("CartesianProduct"),
        ).collect { case (tag, true) => tag }
        val nEx = "Exchange".r.findAllIn(plan).length
        println(f"$name%-28s exchanges=$nEx%2d ${bad.mkString(",")}")
      } catch { case e: Throwable =>
        println(f"$name%-28s PLAN-ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
