package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.GraftLog

/** The Hadoop-FileSystem TableIO is a working deployment impl: the
  * same graft-log / Delta / Iceberg commit-DML-read cycles TableIOSpec
  * drives through the recording proxy run value-exact with
  * HadoopTableIO installed — over `file://` here, over s3a/hdfs/gcs in
  * a deployment (each path resolves its own FileSystem). Raw local FS
  * (no checksum sidecars) mirrors object-store listing behavior. */
class HadoopTableIOSpec extends SparkSpec {
  import spark.implicits._

  private def hio = new HadoopTableIO(() => {
    val c = new org.apache.hadoop.conf.Configuration()
    // RawLocalFileSystem: no .crc sidecars (object stores have none)
    c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    c
  })

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("hio_").toFile
    d.deleteOnExit(); d.getPath
  }

  private def withHadoopIO[A](body: => A): A = {
    val prior = TableIO.current
    TableIO.current = hio
    try body finally TableIO.current = prior
  }

  test("putIfAbsent claims exclusively; move refuses an existing target") {
    val dir = tmp()
    val io = hio
    io.writeString(s"$dir/a.tmp", "first")
    io.writeString(s"$dir/b.tmp", "second")
    assert(io.putIfAbsent(s"$dir/a.tmp", s"$dir/slot"))
    assert(!io.putIfAbsent(s"$dir/b.tmp", s"$dir/slot"))
    assert(io.readString(s"$dir/slot") == "first")
    assert(!io.exists(s"$dir/a.tmp") && !io.exists(s"$dir/b.tmp"))
    io.writeString(s"$dir/c.tmp", "third")
    intercept[Exception](io.move(s"$dir/c.tmp", s"$dir/slot"))
    assert(io.readString(s"$dir/slot") == "first")
    // moveReplace is the mutable-pointer form
    io.moveReplace(s"$dir/c.tmp", s"$dir/slot")
    assert(io.readString(s"$dir/slot") == "third")
  }

  test("putIfAbsent refuses schemes without atomic exclusive create") {
    // a store whose create(overwrite=false) is last-writer-wins (the
    // default object-store shape) cannot arbitrate a commit-version
    // claim — serving putIfAbsent there would silently corrupt every
    // format's OCC. The guard refuses unless the deployment opts the
    // scheme in after enabling the connector's conditional create.
    val dir = tmp()
    val io = new HadoopTableIO(() => {
      val c = new org.apache.hadoop.conf.Configuration()
      c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      c.set("fs.mockstore.impl", classOf[MockStoreFileSystem].getName)
      c
    })
    io.writeString(s"$dir/a.tmp", "payload")
    val e = intercept[UnsupportedOperationException](
      io.putIfAbsent(s"$dir/a.tmp", s"mockstore:$dir/slot"))
    assert(e.getMessage.contains("atomic") &&
      e.getMessage.contains("mockstore"))
    // explicit opt-in (deployment enabled conditional create) serves it
    val optedIn = new HadoopTableIO(() => {
      val c = new org.apache.hadoop.conf.Configuration()
      c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      c.set("fs.mockstore.impl", classOf[MockStoreFileSystem].getName)
      c.set("graft.io.atomic-create.schemes", "mockstore")
      c
    })
    optedIn.writeString(s"$dir/b.tmp", "payload")
    assert(optedIn.putIfAbsent(s"$dir/b.tmp", s"mockstore:$dir/slot"))
    assert(optedIn.readString(s"mockstore:$dir/slot") == "payload")
  }

  test("readLines/list/length match the local impl's semantics") {
    val dir = tmp()
    val io = hio
    io.writeString(s"$dir/f.txt", "a\nb\n")
    assert(io.readLines(s"$dir/f.txt") == Seq("a", "b"))
    assert(LocalTableIO.readLines(s"$dir/f.txt") == Seq("a", "b"))
    assert(io.list(dir) == Seq("f.txt"))
    assert(io.list(s"$dir/missing").isEmpty)
    assert(io.length(s"$dir/f.txt") == LocalTableIO.length(s"$dir/f.txt"))
    assert(io.isDirectory(dir) && !io.isDirectory(s"$dir/f.txt"))
  }

  test("graft-log commit + vectored delete run through HadoopTableIO") {
    withHadoopIO {
      val base = tmp()
      GraftLog.overwrite((0L until 20L).map(k => (k, k * 2)).toDF("k", "v"),
        base)
      GraftLog.deleteVectored(spark, base, col("k") < 5)
      assert(GraftLog.read(spark, base).count() == 15)
      assert(GraftLog.read(spark, base).agg(sum("v")).head().getLong(0) ==
        (5L until 20L).map(_ * 2).sum)
    }
  }

  test("Delta DML cycle runs through HadoopTableIO") {
    withHadoopIO {
      val base = tmp()
      DeltaInterop.overwrite(spark.range(10).toDF("id"), base)
      DeltaInterop.append(spark.range(10, 15).toDF("id").coalesce(1), base)
      DeltaDml.deleteVectoredWhere(spark, base, col("id") % 3 === 0)
      DeltaDml.updateWhere(spark, base, col("id") === 1,
        Map("id" -> lit(100L)))
      val got = DeltaInterop.read(spark, base)
        .orderBy("id").collect().map(_.getLong(0)).toSeq
      assert(got == Seq(2L, 4L, 5L, 7L, 8L, 10L, 11L, 13L, 14L, 100L)
        .sorted)
    }
  }

  test("Iceberg commit + positional delete run through HadoopTableIO") {
    withHadoopIO {
      val base = tmp()
      IcebergInterop.overwrite(spark.range(8).toDF("id").coalesce(1), base)
      IcebergInterop.deletePositionsWhere(spark, base, col("id") < 2)
      assert(IcebergInterop.read(spark, base).count() == 6)
      IcebergInterop.append(spark.range(8, 12).toDF("id").coalesce(1), base)
      assert(IcebergInterop.read(spark, base).count() == 10)
    }
  }

  test("partitioned Iceberg staging (distributed fan-out) through HadoopTableIO") {
    withHadoopIO {
      val base = tmp()
      IcebergInterop.overwrite(
        spark.range(40).select(col("id"),
          (col("id") % 4).cast("int").as("b")),
        base, partitionBy = Seq("b"))
      val one = IcebergInterop.read(spark, base,
        partitionFilters = Map("b" -> "2"))
      assert(one.count() == 10)
    }
  }
}

/** A local-disk FileSystem masquerading as an object-store scheme whose
  * exclusive create is NOT a trustworthy atomic claim — exercises the
  * putIfAbsent capability guard. */
class MockStoreFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockstore:///")
  override def getScheme: String = "mockstore"
}
