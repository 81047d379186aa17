package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.GraftLog

/** The storage seam is real: installing a different TableIO routes the
  * format layer's state operations through it — the property an
  * object-store deployment depends on. A recording proxy wraps the
  * local impl; the graft-log/Delta/Iceberg write+DML+read cycles must
  * drive their commits, claims and mirrors through the proxy. */
class TableIOSpec extends SparkSpec {
  import spark.implicits._

  /** Delegating proxy that records every operation name. */
  private final class Recording(under: TableIO) extends TableIO {
    val ops = new ConcurrentLinkedQueue[String]()
    private def rec[A](op: String)(a: => A): A = { ops.add(op); a }
    def exists(p: String) = rec("exists")(under.exists(p))
    def isDirectory(p: String) = rec("isDirectory")(under.isDirectory(p))
    def list(d: String) = rec("list")(under.list(d))
    def length(p: String) = rec("length")(under.length(p))
    def lastModified(p: String) = rec("lastModified")(under.lastModified(p))
    def mkdirs(d: String) = rec("mkdirs")(under.mkdirs(d))
    def readBytes(p: String) = rec("readBytes")(under.readBytes(p))
    def readString(p: String) = rec("readString")(under.readString(p))
    def readLines(p: String) = rec("readLines")(under.readLines(p))
    def writeBytes(p: String, b: Array[Byte]) =
      rec("writeBytes")(under.writeBytes(p, b))
    def putIfAbsent(s: String, d: String) =
      rec("putIfAbsent")(under.putIfAbsent(s, d))
    def mirror(s: String, d: String) = rec("mirror")(under.mirror(s, d))
    def moveReplace(s: String, d: String) =
      rec("moveReplace")(under.moveReplace(s, d))
    def move(s: String, d: String) = rec("move")(under.move(s, d))
    def delete(p: String) = rec("delete")(under.delete(p))
    def deleteRecursively(p: String) =
      rec("deleteRecursively")(under.deleteRecursively(p))
  }

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("tio_").toFile
    d.deleteOnExit(); d.getPath
  }

  private def withRecording[A](body: Recording => A): A = {
    val rec = new Recording(LocalTableIO)
    val prior = TableIO.current
    TableIO.current = rec
    try body(rec) finally TableIO.current = prior
  }

  test("graft-log commits, claims and DVs route through the installed TableIO") {
    withRecording { rec =>
      val base = tmp()
      GraftLog.overwrite((0L until 20L).map(k => (k, k * 2)).toDF("k", "v"),
        base)
      GraftLog.deleteVectored(spark, base, col("k") < 5)
      assert(GraftLog.read(spark, base).count() == 15)
      val ops = rec.ops.toArray.map(_.toString).toSet
      // the atomic version claim and the DV sidecar write must have
      // gone through the seam — a direct-File bypass would leave these
      // unobserved
      assert(Set("putIfAbsent", "writeBytes", "list", "move", "readString")
        .subsetOf(ops), s"ops seen: $ops")
    }
  }

  test("Delta and Iceberg commit cycles route through the installed TableIO") {
    withRecording { rec =>
      val dbase = tmp()
      DeltaInterop.overwrite(spark.range(10).toDF("id"), dbase)
      DeltaInterop.append(spark.range(10, 15).toDF("id").coalesce(1), dbase)
      assert(DeltaInterop.read(spark, dbase).count() == 15)
      assert(rec.ops.toArray.map(_.toString).toSet.contains("putIfAbsent"))
      rec.ops.clear()
      val ibase = tmp()
      IcebergInterop.overwrite(spark.range(8).toDF("id").coalesce(1), ibase)
      IcebergInterop.deletePositionsWhere(spark, ibase, col("id") < 2)
      assert(IcebergInterop.read(spark, ibase).count() == 6)
      val ops = rec.ops.toArray.map(_.toString).toSet
      // manifest avro bytes + the metadata version claim
      assert(Set("putIfAbsent", "writeBytes", "readBytes", "readString")
        .subsetOf(ops), s"ops seen: $ops")
    }
  }

  test("putIfAbsent: first writer wins, loser sees false, content survives") {
    val dir = tmp()
    val io = LocalTableIO
    io.writeString(s"$dir/a.tmp", "first")
    io.writeString(s"$dir/b.tmp", "second")
    assert(io.putIfAbsent(s"$dir/a.tmp", s"$dir/slot"))
    assert(!io.putIfAbsent(s"$dir/b.tmp", s"$dir/slot"))
    assert(io.readString(s"$dir/slot") == "first")
    // both staging files consumed either way
    assert(!io.exists(s"$dir/a.tmp") && !io.exists(s"$dir/b.tmp"))
  }
}
