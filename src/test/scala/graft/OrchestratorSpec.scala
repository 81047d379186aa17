package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.pipeline.Orchestrator
import graft.pipeline.Orchestrator._

class OrchestratorSpec extends SparkSpec {

  test("diamond DAG: dependency order holds and independent branches really overlap") {
    val events = new ConcurrentLinkedQueue[String]()
    val gate = new CountDownLatch(2)
    val tasks = Seq(
      Task("a")(_ => events.add("a")),
      Task("b", deps = Seq("a")) { _ =>
        events.add("b")
        gate.countDown()
        // both branches must be in-flight at once: if the scheduler ran
        // them serially this await would time out and fail the task
        require(gate.await(10, TimeUnit.SECONDS), "b/c did not overlap")
      },
      Task("c", deps = Seq("a")) { _ =>
        events.add("c")
        gate.countDown()
        require(gate.await(10, TimeUnit.SECONDS), "b/c did not overlap")
      },
      Task("d", deps = Seq("b", "c"))(_ => events.add("d")))
    val report = Orchestrator.run(spark, tasks, parallelism = 4)
    assert(report.succeeded, s"report: ${report.results}")
    val order = events.toArray(Array.empty[String]).toSeq
    assert(order.head == "a")
    assert(order.last == "d")
    assert(order.toSet == Set("a", "b", "c", "d"))
  }

  test("a failed task (after retries) skips transitive downstream, not independent branches") {
    val ran = new ConcurrentLinkedQueue[String]()
    val tasks = Seq(
      Task("boom", retries = 1)(_ => sys.error("always fails")),
      Task("child", deps = Seq("boom"))(_ => ran.add("child")),
      Task("grandchild", deps = Seq("child"))(_ => ran.add("grandchild")),
      Task("independent")(_ => ran.add("independent")))
    val report = Orchestrator.run(spark, tasks)
    assert(!report.succeeded)
    assert(report.results("boom").status == Failed)
    assert(report.results("boom").attempts == 2) // 1 try + 1 retry
    assert(report.results("boom").error.exists(_.getMessage.contains("always fails")))
    assert(report.results("child").status == Skipped)
    assert(report.results("grandchild").status == Skipped)
    assert(report.results("independent").status == Succeeded)
    assert(ran.toArray(Array.empty[String]).toSet == Set("independent"))
  }

  test("a flaky task succeeds on its retry") {
    val calls = new AtomicInteger(0)
    val tasks = Seq(Task("flaky", retries = 2) { _ =>
      if (calls.incrementAndGet() == 1) sys.error("transient")
    })
    val report = Orchestrator.run(spark, tasks)
    assert(report.results("flaky").status == Succeeded)
    assert(report.results("flaky").attempts == 2)
  }

  test("resume: done-markers skip completed work on a re-run") {
    val markers = s"/tmp/graft_test_orch_markers_${System.nanoTime()}"
    val runs = new AtomicInteger(0)
    def tasks = Seq(
      Task("stage1")(_ => runs.incrementAndGet()),
      Task("stage2", deps = Seq("stage1"))(_ => runs.incrementAndGet()))
    val first = Orchestrator.run(spark, tasks, markerDir = Some(markers))
    assert(first.succeeded && runs.get() == 2)
    val second = Orchestrator.run(spark, tasks, markerDir = Some(markers))
    assert(second.succeeded)
    assert(second.results.values.forall(_.status == Resumed))
    assert(runs.get() == 2, "resumed run must not re-execute task bodies")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(markers))
  }

  test("validation rejects duplicate names, unknown deps, and cycles") {
    intercept[IllegalArgumentException] {
      Orchestrator.validate(Seq(Task("x")(_ => ()), Task("x")(_ => ())))
    }
    intercept[IllegalArgumentException] {
      Orchestrator.validate(Seq(Task("x", deps = Seq("ghost"))(_ => ())))
    }
    intercept[IllegalArgumentException] {
      Orchestrator.validate(Seq(
        Task("x", deps = Seq("y"))(_ => ()),
        Task("y", deps = Seq("x"))(_ => ())))
    }
  }

  test("a deep linear chain completes on a small pool (no thread-per-waiting-task deadlock)") {
    val n = 20
    val seen = new ConcurrentLinkedQueue[Int]()
    val tasks = (1 to n).map { i =>
      Task(s"t$i", deps = if (i == 1) Seq.empty else Seq(s"t${i - 1}")) { _ =>
        seen.add(i)
      }
    }
    val report = Orchestrator.run(spark, tasks, parallelism = 2, timeoutSec = 60)
    assert(report.succeeded)
    assert(seen.toArray(Array.empty[Integer]).map(_.toInt).toSeq == (1 to n))
  }
}
