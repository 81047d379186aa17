package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop

/** Write-audit-publish on Iceberg branches: branch appends are
  * invisible on main until fastForward publishes; publish is ancestry-
  * checked metadata only; expiration never strands an unpublished
  * branch. */
class IcebergWapSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"/tmp/graft_test_wap_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  test("branch appends are invisible on main, visible on the branch") {
    val base = fresh("basic")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    IcebergInterop.appendToBranch(Seq((2L, "b")).toDF("k", "s"), base, "audit")
    IcebergInterop.appendToBranch(Seq((3L, "c")).toDF("k", "s"), base, "audit")
    // main: untouched
    assert(IcebergInterop.read(spark, base).count() == 1L)
    // branch: base + both appends (the second chained on the first)
    assert(IcebergInterop.readRef(spark, base, "audit")
      .as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("fastForward publishes the branch; second publish is a no-op") {
    val base = fresh("publish")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    IcebergInterop.appendToBranch(Seq((2L, "b")).toDF("k", "s"), base, "wap")
    val published = IcebergInterop.fastForward(base, "wap")
    assert(IcebergInterop.read(spark, base).count() == 2L)
    assert(IcebergInterop.resolveRef(base, "main") == published)
    assert(IcebergInterop.fastForward(base, "wap") == published)
    // post-publish appends to main continue normally
    IcebergInterop.append(Seq((4L, "d")).toDF("k", "s"), base)
    assert(IcebergInterop.read(spark, base).count() == 3L)
  }

  test("a diverged branch refuses to publish") {
    val base = fresh("diverge")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    IcebergInterop.appendToBranch(Seq((2L, "b")).toDF("k", "s"), base, "old")
    // main moves on while the branch sits unpublished
    IcebergInterop.append(Seq((9L, "z")).toDF("k", "s"), base)
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.fastForward(base, "old")
    }
    assert(e.getMessage.contains("not an ancestor"))
    // neither side was harmed
    assert(IcebergInterop.read(spark, base).count() == 2L)
    assert(IcebergInterop.readRef(spark, base, "old").count() == 2L)
  }

  test("tags refuse writes and publishes") {
    val base = fresh("tag")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    IcebergInterop.createTag(base, "v1", IcebergInterop.resolveRef(base, "main"))
    val w = intercept[IllegalArgumentException] {
      IcebergInterop.appendToBranch(Seq((2L, "b")).toDF("k", "s"), base, "v1")
    }
    assert(w.getMessage.contains("tag"))
    val f = intercept[IllegalArgumentException] {
      IcebergInterop.fastForward(base, "v1")
    }
    assert(f.getMessage.contains("tag"))
  }

  test("expiration pins an unpublished branch's ancestry; publish still works") {
    val base = fresh("expire")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    IcebergInterop.appendToBranch(Seq((2L, "b")).toDF("k", "s"), base, "keep")
    IcebergInterop.appendToBranch(Seq((3L, "c")).toDF("k", "s"), base, "keep")
    // main appends make older snapshots expirable
    IcebergInterop.append(Seq((4L, "d")).toDF("k", "s"), base)
    IcebergInterop.expireSnapshots(spark, base, retainLast = 1)
    // the branch survives whole (head + chain) and still reads
    assert(IcebergInterop.readRef(spark, base, "keep")
      .as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
    // main advanced past the fork → publish correctly refuses (diverged)
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.fastForward(base, "keep")
    }
    assert(e.getMessage.contains("not an ancestor"))
  }

  test("publish after expire works when main never moved") {
    val base = fresh("expire_pub")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    IcebergInterop.appendToBranch(Seq((2L, "b")).toDF("k", "s"), base, "wap")
    IcebergInterop.appendToBranch(Seq((3L, "c")).toDF("k", "s"), base, "wap")
    IcebergInterop.expireSnapshots(spark, base, retainLast = 1)
    IcebergInterop.fastForward(base, "wap")
    assert(IcebergInterop.read(spark, base).count() == 3L)
  }

  test("cherry-pick publishes a diverged branch's append onto main") {
    val base = fresh("pick")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    IcebergInterop.appendToBranch(Seq((2L, "b"), (3L, "c")).toDF("k", "s"),
      base, "wap")
    val branchHead = IcebergInterop.resolveRef(base, "wap")
    // main moves on → fastForward refuses → cherry-pick is the rebase
    IcebergInterop.append(Seq((9L, "z")).toDF("k", "s"), base)
    intercept[IllegalArgumentException] {
      IcebergInterop.fastForward(base, "wap")
    }
    IcebergInterop.cherryPick(spark, base, branchHead)
    assert(IcebergInterop.read(spark, base).select("k")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 9L))
    // double-apply refuses
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.cherryPick(spark, base, branchHead)
    }
    assert(e.getMessage.contains("double-apply"))
  }

  test("cherry-pick re-sequences: older main deletes do not mask it") {
    val base = fresh("pick_seq")
    IcebergInterop.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), base)
    IcebergInterop.appendToBranch(Seq((2L, "B2")).toDF("k", "s"),
      base, "wap")
    val branchHead = IcebergInterop.resolveRef(base, "wap")
    // main gains an equality delete on k=2 AFTER the branch append; the
    // cherry-picked rows commit at a NEWER sequence, so they survive
    IcebergInterop.addEqualityDeletes(spark, base,
      Seq(2L).toDF("k"), Seq("k"))
    assert(IcebergInterop.read(spark, base).count() == 1L)
    IcebergInterop.cherryPick(spark, base, branchHead)
    val got = IcebergInterop.read(spark, base).as[(Long, String)]
      .collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "B2")),
      s"older delete retroactively masked the cherry-pick: $got")
  }

  test("cherry-pick refuses non-append snapshots") {
    val base = fresh("pick_refuse")
    IcebergInterop.overwrite(Seq((1L, "a")).toDF("k", "s"), base)
    val overwriteSnap = IcebergInterop.resolveRef(base, "main")
    IcebergInterop.append(Seq((2L, "b")).toDF("k", "s"), base)
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.cherryPick(spark, base, overwriteSnap)
    }
    assert(e.getMessage.contains("APPEND"))
  }

  test("branch writes on a partitioned table keep the spec") {
    val base = fresh("part")
    IcebergInterop.overwrite(
      Seq((1L, "A"), (2L, "B")).toDF("k", "g"), base, Seq("g"))
    IcebergInterop.appendToBranch(
      Seq((3L, "A"), (4L, "C")).toDF("k", "g"), base, "wap", Seq("g"))
    IcebergInterop.fastForward(base, "wap")
    // partition pruning still holds post-publish
    val got = IcebergInterop.readEq(spark, base, Map("g" -> "A"))
    assert(got.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("SQL: CREATE/DROP TAG and BRANCH; VERSION AS OF reads the ref") {
    import graft.pipeline.GraftSql
    val base = fresh("sql_refs")
    IcebergInterop.overwrite(spark.range(6).toDF("id").coalesce(1), base)
    IcebergInterop.append(spark.range(6, 10).toDF("id").coalesce(1), base)
    GraftSql.registerIcebergTable(spark, "refs_t", base)
    // tag pinned to an EXPLICIT older snapshot
    GraftSql.sql(spark, "ALTER TABLE refs_t CREATE TAG rel-1 AS OF VERSION 1")
    // branch from the current head
    GraftSql.sql(spark, "ALTER TABLE refs_t CREATE BRANCH audit")
    val refs = IcebergInterop.refs(base).map(r => (r._1, r._2)).toMap
    assert(refs("rel-1") == "tag" && refs("audit") == "branch")
    // the tag reads the OLD state through SQL time travel
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM refs_t VERSION AS OF 'rel-1'")
      .head().getLong(0) == 6)
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM refs_t VERSION AS OF 'audit'")
      .head().getLong(0) == 10)
    // a branch append stays invisible on main, visible via the ref
    IcebergInterop.appendToBranch(
      spark.range(100, 103).toDF("id").coalesce(1), base, "audit")
    assert(spark.table("refs_t").count() == 10)
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM refs_t VERSION AS OF 'audit'")
      .head().getLong(0) == 13)
    // drop: the refs disappear; main is untouched
    GraftSql.sql(spark, "ALTER TABLE refs_t DROP TAG rel-1")
    GraftSql.sql(spark, "ALTER TABLE refs_t DROP BRANCH audit")
    assert(!IcebergInterop.refs(base).map(_._1).toSet
      .exists(Set("rel-1", "audit")))
    assert(spark.table("refs_t").count() == 10)
    // on a non-Iceberg table the statement refuses
    val del = fresh("sql_refs_delta")
    graft.sources.DeltaInterop.overwrite(spark.range(3).toDF("id"), del)
    GraftSql.registerDeltaTable(spark, "refs_d", del)
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ALTER TABLE refs_d CREATE TAG t1"))
    assert(e.getMessage.contains("Iceberg"), e.getMessage)
  }
}
