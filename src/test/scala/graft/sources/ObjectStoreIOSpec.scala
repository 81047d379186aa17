package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.GraftLog

/** Object-store conformance: the full graft-log / Delta / Iceberg
  * commit+DML cycles run value-exact through [[ObjectStoreTableIO]] —
  * S3 semantics (flat keys, PUT-only, conditional-PUT-gated claims,
  * server-side-copy mirror) rather than the POSIX affordances the
  * local impl leans on. Sibling of HadoopTableIOSpec; both capability
  * branches of the exclusive-create guard are exercised end-to-end. */
class ObjectStoreIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("osio_").toFile
    d.deleteOnExit(); d.getPath
  }

  private def withStore[A](io: ObjectStoreTableIO)(body: => A): A = {
    val prior = TableIO.current
    TableIO.current = io
    try body finally TableIO.current = prior
  }

  test("primitives: flat keys, conditional-PUT gate, copy mirror, " +
       "PUT-shaped moves") {
    val dir = tmp()
    val off = new ObjectStoreTableIO(conditionalCreate = false)
    // mkdirs is a no-op; a PUT materializes its parents (flat keys)
    off.mkdirs(s"$dir/ghost")
    assert(!off.isDirectory(s"$dir/ghost"),
      "an empty 'directory' must not exist in a flat key space")
    off.writeString(s"$dir/a/b/obj.txt", "x")
    assert(off.isDirectory(s"$dir/a/b") && off.list(s"$dir/a/b") == Seq("obj.txt"))
    // no conditional PUT → the claim REFUSES (check-then-PUT would
    // silently last-writer-win a commit race)
    off.writeString(s"$dir/c.tmp", "payload")
    val e = intercept[UnsupportedOperationException](
      off.putIfAbsent(s"$dir/c.tmp", s"$dir/slot"))
    assert(e.getMessage.contains("conditional PUT") ||
      e.getMessage.contains("last-writer-wins"))
    // capability on → exclusive claim, loser sees false
    val on = new ObjectStoreTableIO(conditionalCreate = true)
    on.writeString(s"$dir/w1.tmp", "first")
    on.writeString(s"$dir/w2.tmp", "second")
    assert(on.putIfAbsent(s"$dir/w1.tmp", s"$dir/slot"))
    assert(!on.putIfAbsent(s"$dir/w2.tmp", s"$dir/slot"))
    assert(on.readString(s"$dir/slot") == "first")
    assert(!on.exists(s"$dir/w1.tmp") && !on.exists(s"$dir/w2.tmp"))
    // mirror = server-side COPY (no links): bytes duplicate, existing
    // target wins, the copy counter pins the path taken
    on.writeString(s"$dir/imm.bin", "immutable")
    on.mirror(s"$dir/imm.bin", s"$dir/imm2.bin")
    assert(on.serverSideCopies.get() == 1)
    on.writeString(s"$dir/other.bin", "other")
    on.mirror(s"$dir/other.bin", s"$dir/imm2.bin") // existing wins
    assert(on.readString(s"$dir/imm2.bin") == "immutable")
    assert(on.serverSideCopies.get() == 1, "existing target must not re-copy")
    // the mirrored bytes are independent objects, not links
    on.writeString(s"$dir/imm.bin", "rewritten")
    assert(on.readString(s"$dir/imm2.bin") == "immutable")
    // move refuses an existing target; moveReplace is the pointer PUT
    on.writeString(s"$dir/m.tmp", "third")
    intercept[java.nio.file.FileAlreadyExistsException](
      on.move(s"$dir/m.tmp", s"$dir/slot"))
    on.moveReplace(s"$dir/m.tmp", s"$dir/slot")
    assert(on.readString(s"$dir/slot") == "third")
  }

  test("without conditional PUT, a format COMMIT refuses loudly") {
    withStore(new ObjectStoreTableIO(conditionalCreate = false)) {
      val base = tmp()
      intercept[UnsupportedOperationException](
        GraftLog.overwrite(spark.range(5).toDF("id"), base))
    }
  }

  test("graft-log commit + vectored delete run through the object store") {
    withStore(new ObjectStoreTableIO(conditionalCreate = true)) {
      val base = tmp()
      GraftLog.overwrite((0L until 20L).map(k => (k, k * 2)).toDF("k", "v"),
        base)
      GraftLog.deleteVectored(spark, base, col("k") < 5)
      assert(GraftLog.read(spark, base).count() == 15)
      assert(GraftLog.read(spark, base).agg(sum("v")).head().getLong(0) ==
        (5L until 20L).map(_ * 2).sum)
    }
  }

  test("Delta DML cycle runs through the object store") {
    withStore(new ObjectStoreTableIO(conditionalCreate = true)) {
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

  test("Iceberg commit + positional delete run through the object store") {
    withStore(new ObjectStoreTableIO(conditionalCreate = true)) {
      val base = tmp()
      IcebergInterop.overwrite(spark.range(8).toDF("id").coalesce(1), base)
      IcebergInterop.deletePositionsWhere(spark, base, col("id") < 2)
      assert(IcebergInterop.read(spark, base).count() == 6)
      IcebergInterop.append(spark.range(8, 12).toDF("id").coalesce(1), base)
      assert(IcebergInterop.read(spark, base).count() == 10)
    }
  }

  test("Delta deep clone takes the server-side-copy mirror path") {
    val io = new ObjectStoreTableIO(conditionalCreate = true)
    withStore(io) {
      val src = tmp(); val dst = tmp() + "/clone"
      DeltaInterop.overwrite(spark.range(12).toDF("id"), src)
      DeltaDml.deleteVectoredWhere(spark, src, col("id") < 2)
      val before = io.serverSideCopies.get()
      DeltaInterop.deepClone(spark, src, dst)
      assert(io.serverSideCopies.get() > before,
        "deep clone on an object store must server-side copy")
      val got = DeltaInterop.read(spark, dst)
        .orderBy("id").collect().map(_.getLong(0)).toSeq
      assert(got == (2L until 12L).toSeq)
      // clone is independent bytes: mutating the source leaves it
      DeltaDml.deleteVectoredWhere(spark, src, col("id") === 5L)
      assert(DeltaInterop.read(spark, dst).count() == 10)
    }
  }

  test("stale LIST yields a consistent OLDER snapshot, never a torn one") {
    val io = new ObjectStoreTableIO(conditionalCreate = true)
    withStore(io) {
      val base = tmp()
      DeltaInterop.overwrite(spark.range(5).toDF("id"), base)
      DeltaInterop.append(spark.range(5, 8).toDF("id").coalesce(1), base)
      io.beginListingLag()
      DeltaInterop.append(spark.range(8, 11).toDF("id").coalesce(1), base)
      // the new commit object is GET-visible but not LIST-visible: a
      // reader discovers head = v1 and reads that complete version
      val stale = DeltaInterop.read(spark, base)
        .orderBy("id").collect().map(_.getLong(0)).toSeq
      assert(stale == (0L until 8L).toSeq,
        s"stale listing must give the v1 prefix view, got $stale")
      io.settleListing()
      val fresh = DeltaInterop.read(spark, base)
        .orderBy("id").collect().map(_.getLong(0)).toSeq
      assert(fresh == (0L until 11L).toSeq)
    }
  }
}
