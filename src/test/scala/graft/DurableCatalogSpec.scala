package graft

import java.io.File

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS catalog durability: register a table in one JVM, read it
  * back by name in a fresh JVM whose only shared state is the Derby
  * metastore directory. Runs `DurableCatalogProbe` as subprocesses
  * because `spark.sql.catalogImplementation` is fixed at context start —
  * the suite-wide shared session can't flip to Hive, and a same-JVM
  * restart wouldn't prove process-level durability anyway. */
class DurableCatalogSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runProbe(phase: String, dirs: Seq[String]): String = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val out = new StringBuilder
    val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
      "graft.pipeline.DurableCatalogProbe", phase) ++ dirs
    val rc = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'),
      _ => ()))
    assert(rc == 0, s"probe $phase exited $rc:\n$out")
    out.toString
  }

  test("a table registered in one process resolves by name in a fresh process") {
    val root = "/tmp/graft_test_durable"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
    val dirs = Seq(s"$root/metastore", s"$root/warehouse", s"$root/data")
    val reg = runProbe("register", dirs)
    assert(reg.contains("REGISTERED 3"), s"register phase output:\n$reg")
    val read = runProbe("read", dirs)
    assert(read.contains("DURABLE_OK 3"), s"read phase output:\n$read")
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }
}
