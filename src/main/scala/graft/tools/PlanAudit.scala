package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{CoalesceExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Whole-inventory executed-plan audit: runs EVERY `SparkEntry.queries`
  * entry at a small SF and fails on the plan shapes that silently
  * murder a 100 TB run —
  *
  *  - `CartesianProduct` (always a bug at scale);
  *  - `BroadcastNestedLoopJoin` whose broadcast side is NOT provably
  *    bounded (a global aggregate, a limit, or a local relation — the
  *    repo's deliberate 1-row totals crossJoins are bounded by
  *    construction and pass);
  *  - statically `SinglePartition` shuffle exchanges that are not the
  *    partial→final step of a GLOBAL aggregate or a limit (an
  *    unpartitioned Window / global row_number funnels the whole
  *    dataset through one task — the class `Relational.globalRank`
  *    exists to kill);
  *  - codegen fallbacks captured from the log (`Expr codegen error` —
  *    an expression whose doGenCode emits uncompilable Java silently
  *    drops the whole projection to interpreted mode; round 8's
  *    freshName collision hid exactly this way).
  *
  * AQE note: runs each query to completion first — final adaptive
  * plans exist only after execution — then walks the ADAPTIVE result
  * including query stages and subqueries. AQE-coalesced single
  * partitions (runtime size decisions at tiny SF) are NOT flagged;
  * only static SinglePartition requirements are.
  *
  * Exit 0 = clean; exit 1 = findings (one line each). Wire into the
  * round loop next to Verify.
  */
object PlanAudit {

  /** name → reason, for shapes the audit's static heuristics cannot
    * prove bounded but that are bounded BY CONSTRUCTION. Every entry
    * must say why; an entry without a real bound is a suppressed bug. */
  private val allow: Map[String, String] = Map(
    "q32_ngram_jaccard" -> ("broadcast side is docs.filter(doc_id < 20) " +
      "— a <=20-row probe frame vs the corpus (brute-force baseline; " +
      "the scale path is q33's banded LSH)"),
    "q40_cosine_topk" -> ("broadcast side is a 10-row query frame " +
      "(embQueries(_, 10)) vs the corpus — exact top-k baseline; the " +
      "scale path is q42/q54 ANN"),
    "q41_embed_neardup" -> ("broadcast side is a 200-row probe frame " +
      "vs the corpus — cosine near-dup baseline; scale path is " +
      "q92/q153's bucketed variants"),
    "q59_sql_functions" -> ("non-equi join's broadcast side is " +
      "vec_id < 5 (a <=5-row probe frame) — exercises the SQL-registered " +
      "native expressions, not a join strategy"),
    "q86_moving_average" -> ("the SinglePartition window input is the " +
      "per-DAY aggregate — bounded by the date domain (~2.4k rows for " +
      "7 years) regardless of table size"))

  private def finalOf(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalOf(a.executedPlan)
    case other => other
  }

  /** Every node of the FINAL plan, expanding adaptive wrappers, query
    * stages and subqueries. */
  private def all(p: SparkPlan): Seq[SparkPlan] = {
    val self = finalOf(p)
    val kids = self.children.flatMap(all) ++ (self match {
      case qs: QueryStageExec => all(qs.plan)
      case _ => Seq.empty
    }) ++ self.subqueries.flatMap(all)
    self +: kids
  }

  /** A plan subtree is BOUNDED if it ends in a global aggregate (no
    * grouping keys → ≤1 row per, er, everything), a limit, or a local
    * relation — the shapes the repo's deliberate broadcast crossJoins
    * are built from. */
  private def bounded(p: SparkPlan): Boolean = all(p).exists {
    case h: HashAggregateExec => h.groupingExpressions.isEmpty
    case h: ObjectHashAggregateExec => h.groupingExpressions.isEmpty
    case h: SortAggregateExec => h.groupingExpressions.isEmpty
    case _: TakeOrderedAndProjectExec => true
    case l: LocalTableScanExec => l.rows.lengthCompare(100) <= 0
    case n => n.nodeName.contains("Limit")
  }

  private def audit(name: String, plan: SparkPlan): Seq[String] = {
    val nodes = all(plan)
    val cartesian = nodes.collect { case c: CartesianProductExec =>
      s"$name: CartesianProduct over ${c.left.nodeName} × ${c.right.nodeName}"
    }
    val nlj = nodes.collect {
      case b: BroadcastNestedLoopJoinExec =>
        val build = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
        }
        if (bounded(build)) None
        else Some(s"$name: BroadcastNestedLoopJoin with UNBOUNDED build " +
          s"side ${build.nodeName}")
    }.flatten
    val singleParts = nodes.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning ==
            org.apache.spark.sql.catalyst.plans.physical.SinglePartition =>
        // partial→final global aggregate and limit funnels are the
        // legitimate ≤1-row-per-partition reasons to gather
        if (bounded(e.child)) None
        else Some(s"$name: STATIC SinglePartition exchange under " +
          s"${e.child.nodeName} — whole dataset through one task")
      case c: CoalesceExec if c.numPartitions == 1 && !bounded(c.child) =>
        Some(s"$name: coalesce(1) over unbounded ${c.child.nodeName}")
    }.flatten
    (cartesian ++ nlj ++ singleParts).filterNot(_ => allow.contains(name))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Tables.withTestdataConfs(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // capture codegen-fallback and unpartitioned-window warnings while
    // the queries run (the latter is Spark's own one-task-funnel alarm;
    // the static SinglePartition check misses windows whose input
    // arrived single-partition without a fresh exchange)
    val codegenHits =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val windowHits =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val capture = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-plan-audit", null,
        org.apache.logging.log4j.core.layout.PatternLayout
          .createDefaultLayout(),
        true, org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("Expr codegen error") ||
            m.contains("Codegen disabled for this expression"))
          codegenHits.add(m.linesIterator.next().take(200))
        if (m.contains("No Partition Defined for Window"))
          windowHits.add(m.linesIterator.next().take(200))
      }
    }
    capture.start()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    ctx.getConfiguration.getRootLogger
      .addAppender(capture, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()

    var findings = Vector.empty[String]
    var executed = 0
    val t0 = System.nanoTime()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = codegenHits.size
      val beforeW = windowHits.size
      try {
        val df = fn(spark, sfDir)
        df.collect() // AQE: the final plan exists only after execution
        executed += 1
        findings ++= audit(name, df.queryExecution.executedPlan)
        if (codegenHits.size > before)
          findings :+= s"$name: codegen fallback — ${codegenHits.peek()}"
        if (windowHits.size > beforeW && !allow.contains(name))
          findings :+= s"$name: unpartitioned Window — whole dataset " +
            "through one task (use Relational.globalRank/groupedRank)"
      } catch {
        case e: Throwable =>
          findings :+= s"$name: EXECUTION FAILED " +
            s"${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).linesIterator.next().take(160)}"
      }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    findings.foreach(f => println(s"[plan-audit] FINDING $f"))
    println(f"""{"metric":"plan_audit","queries":$executed,""" +
      f""""findings":${findings.size},"sec":$secs%.1f,"sf":"$sfDir"}""")
    spark.stop()
    if (findings.nonEmpty) sys.exit(1)
  }
}
