package graft.pipeline

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Dependency-ordered pipeline scheduling — the engine-side equivalent of
  * the reference's Airflow layer (10 DAGs, each a linear
  * prepare → spark-job → publish chain per source, with bronze → silver →
  * gold ordered across DAGs; airflow/dags/product_bronze_dag.py:18-50,
  * product_silver_dag.py, product_gold_dag.py). What Airflow provides
  * there and this provides here:
  *
  *  - **dependency-ordered execution**: a task starts only after every
  *    upstream task SUCCEEDED; independent tasks run concurrently on a
  *    bounded pool (Airflow's scheduler parallelism);
  *  - **upstream-failure semantics**: a failed task (after its retries)
  *    marks every transitive downstream task `Skipped` — never run on
  *    missing inputs (Airflow's `upstream_failed`);
  *  - **per-task retries** (Airflow's `retries=`);
  *  - **resume**: with a marker directory, completed tasks record a done
  *    marker and a re-run of the same DAG skips them (`Resumed`) — crash
  *    recovery without re-computing finished stages (Airflow's task-
  *    instance state). Markers are task-scoped files written ATOMICALLY
  *    (tmp + move), so a crash mid-write never fakes completion.
  *
  * Scale note: the orchestrator moves METADATA only — every task body is
  * a Spark job that is itself distributed. One driver-side thread per
  * RUNNING task is the same footprint as chained `spark-submit`s, and the
  * bounded pool keeps concurrent jobs from starving each other (pair
  * with `spark.scheduler.mode=FAIR` when tasks overlap).
  */
object Orchestrator {

  sealed trait Status
  case object Succeeded extends Status
  case object Failed extends Status
  /** Not run because an upstream task failed (or was itself skipped). */
  case object Skipped extends Status
  /** Not run because a previous run's done-marker proves completion. */
  case object Resumed extends Status

  final case class Task(name: String, deps: Seq[String] = Seq.empty,
                        retries: Int = 0)(val body: SparkSession => Unit)

  final case class TaskResult(name: String, status: Status, attempts: Int,
                              error: Option[Throwable])

  final case class RunReport(results: Map[String, TaskResult]) {
    def succeeded: Boolean = results.values.forall(r =>
      r.status == Succeeded || r.status == Resumed)
    def failedTasks: Seq[String] =
      results.values.collect { case r if r.status == Failed => r.name }.toSeq
  }

  /** Validate the task graph: unique names, known deps, no cycles.
    * Returns a topological order (used only for deterministic reporting —
    * execution order is event-driven). */
  def validate(tasks: Seq[Task]): Seq[String] = {
    val names = tasks.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate task names: ${names.diff(names.distinct).distinct.mkString(",")}")
    val known = names.toSet
    tasks.foreach(t => t.deps.foreach(d => require(known.contains(d),
      s"task '${t.name}' depends on unknown task '$d'")))
    // Kahn's algorithm; leftover nodes = cycle
    val inDeg = mutable.Map(tasks.map(t => t.name -> t.deps.size): _*)
    val downstream = tasks.flatMap(t => t.deps.map(_ -> t.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val queue = mutable.Queue(tasks.filter(_.deps.isEmpty).map(_.name): _*)
    val order = mutable.ArrayBuffer.empty[String]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      order += n
      downstream.getOrElse(n, Seq.empty).foreach { d =>
        inDeg(d) -= 1
        if (inDeg(d) == 0) queue.enqueue(d)
      }
    }
    require(order.size == tasks.size,
      s"dependency cycle among: ${(known -- order).mkString(",")}")
    order.toSeq
  }

  /** Run the DAG. Event-driven: every task holds a counter of unfinished
    * deps; finishing a task (in any terminal state) decrements its
    * downstreams', and whichever decrement reaches zero SUBMITS that task
    * to the bounded pool. A task never occupies a pool thread while
    * waiting (a pool-sized set of blocked waiters would deadlock a
    * linear chain), there is no polling, and no barrier between
    * "levels" — a slow branch never delays an independent one. */
  def run(spark: SparkSession, tasks: Seq[Task], parallelism: Int = 4,
          markerDir: Option[String] = None,
          timeoutSec: Long = 3600): RunReport = {
    validate(tasks)
    markerDir.foreach(d => new File(d).mkdirs())
    val byName = tasks.map(t => t.name -> t).toMap
    val downstream: Map[String, Seq[String]] =
      tasks.flatMap(t => t.deps.map(_ -> t.name))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val results = new ConcurrentHashMap[String, TaskResult]()
    val pendingDeps = tasks.map(t =>
      t.name -> new java.util.concurrent.atomic.AtomicInteger(t.deps.size)).toMap
    val allDone = new CountDownLatch(tasks.size)
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))

    def marker(name: String): Option[File] =
      markerDir.map(d => new File(d, s"$name.done"))

    def finish(name: String, r: TaskResult): Unit = {
      results.put(name, r)
      allDone.countDown()
      downstream.getOrElse(name, Seq.empty).foreach { d =>
        // exactly one decrement reaches 0 → exactly one submission
        if (pendingDeps(d).decrementAndGet() == 0) submit(byName(d))
      }
    }

    def submit(t: Task): Unit = pool.execute { () =>
      // all deps are terminal by construction (counter reached 0)
      val badDep = t.deps.find { d =>
        val s = results.get(d).status; s == Failed || s == Skipped
      }
      if (badDep.isDefined) {
        finish(t.name, TaskResult(t.name, Skipped, 0, None))
      } else if (marker(t.name).exists(_.exists())) {
        finish(t.name, TaskResult(t.name, Resumed, 0, None))
      } else {
        var attempt = 0
        var done = false
        var lastErr: Option[Throwable] = None
        while (!done && attempt <= t.retries &&
               !Thread.currentThread().isInterrupted) {
          attempt += 1
          try {
            t.body(spark)
            done = true
          } catch {
            case e: InterruptedException =>
              // run-timeout shutdownNow: stop NOW — retrying a Spark job
              // on a dead run would keep the JVM busy past the failure
              lastErr = Some(e)
              Thread.currentThread().interrupt()
            case e: Throwable => lastErr = Some(e)
          }
        }
        if (done) {
          try marker(t.name).foreach { m =>
            // atomic marker publish: a crash mid-write must not leave a
            // half marker that a resume would trust
            val tmp = new File(m.getParentFile, s".tmp_${UUID.randomUUID()}")
            Files.writeString(tmp.toPath, "done")
            Files.move(tmp.toPath, m.toPath, StandardCopyOption.ATOMIC_MOVE)
          } catch { case _: Throwable =>
            // the WORK succeeded; a failed marker only costs a re-run
            // after crash. It must not kill this Runnable before
            // finish() — that would strand every downstream task until
            // the run timeout.
          }
          finish(t.name, TaskResult(t.name, Succeeded, attempt, None))
        } else {
          finish(t.name, TaskResult(t.name, Failed, attempt, lastErr))
        }
      }
    }

    tasks.filter(_.deps.isEmpty).foreach(submit)
    val finished = allDone.await(timeoutSec, TimeUnit.SECONDS)
    pool.shutdownNow()
    require(finished, s"orchestrator run exceeded ${timeoutSec}s; " +
      s"finished: ${results.keySet()}")
    RunReport(tasks.map(t => t.name -> results.get(t.name)).toMap)
  }
}
