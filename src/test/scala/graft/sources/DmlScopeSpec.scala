package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Statistics-scoped DML classification scans: a predicate touching a
  * slice of a clustered table's key space must not open every file to
  * find its rows — and the pruning must be CONSERVATIVE (never changes
  * an answer: unsupported predicate shapes, casts, ORs all keep every
  * file). */
class DmlScopeSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("dmlscope_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("PredicateBounds extracts conjunct ranges, mirrors, equalities") {
    def cs(c: org.apache.spark.sql.Column) =
      PredicateBounds.rangeConstraints(
        org.apache.spark.sql.GraftBridge.catalystExpression(c))
    val r = cs(col("k") >= 10 && col("k") < 20 && col("v") === "x" &&
      col("k") % 5 === 0)
    assert(r("k") == PredicateBounds.Bounds(Some(10), Some(20)))
    assert(r("v") == PredicateBounds.Bounds(Some("x"), Some("x")))
    // literal-on-the-left mirrors
    assert(cs(lit(100) > col("k"))("k") ==
      PredicateBounds.Bounds(None, Some(100)))
    assert(cs(lit(7) <= col("k"))("k") ==
      PredicateBounds.Bounds(Some(7), None))
    // repeated conjuncts: first bound per side wins (conservative)
    assert(cs(col("k") > 3 && col("k") > 5)("k") ==
      PredicateBounds.Bounds(Some(3), None))
    // nothing analyzable → no constraints
    assert(cs(col("k") % 5 === 0).isEmpty)
    assert(cs(col("k") < 5 || col("k") > 9).isEmpty)
    assert(cs(!(col("k") < 5)).isEmpty)
    // casts are NOT unwrapped (numeric-vs-lexicographic trap)
    assert(cs(col("s").cast("int") < 5).isEmpty)
    // date/timestamp literals carry internal reps → no constraint
    assert(cs(col("d") < lit(java.sql.Date.valueOf("1995-01-01"))).isEmpty)
    // SQL-parsed predicates (the GraftSql DELETE path) extract too —
    // they arrive as catalyst comparisons, not ColumnNode functions
    val parsed = org.apache.spark.sql.GraftBridge.column(
      spark.sessionState.sqlParser.parseExpression("k >= 10 AND k < 20"))
    assert(cs(parsed)("k") == PredicateBounds.Bounds(Some(10), Some(20)))
  }

  test("Delta: scopedFiles opens only stats-admitted files; DML exact") {
    val base = tmp()
    DeltaInterop.overwrite(
      spark.range(400).toDF("k")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"), base)
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.files.size == 4)
    // k < 50 lives in exactly one range file
    assert(DeltaDml.scopedFiles(snap, col("k") < 50).size == 1)
    assert(DeltaDml.scopedFiles(snap,
      col("k") >= 150 && col("k") < 250).size <= 2)
    // unsupported shapes keep everything
    assert(DeltaDml.scopedFiles(snap, col("k") % 7 === 0).size == 4)
    assert(DeltaDml.scopedFiles(snap,
      col("k") < 50 || col("k") > 350).size == 4)
    // the scoped DELETE is still value-exact, with the analyzable
    // conjunct pruning and the modulo conjunct filtering rows
    DeltaDml.deleteVectoredWhere(spark, base,
      col("k") >= 100 && col("k") < 200 && col("k") % 2 === 0)
    val got = DeltaInterop.read(spark, base).as[Long].collect().sorted
    val want = (0L until 400L).filterNot(k => k >= 100 && k < 200 && k % 2 == 0)
    assert(got.toSeq == want)
    // only the admitted file gained a deletion vector
    assert(DeltaInterop.snapshot(spark, base).files.count(_.dv.isDefined) == 1)
  }

  test("property: scoped deletes match the in-memory model across random predicates") {
    // seeded sweep: whatever ranges the predicates carve, the scoped
    // classification must delete exactly the model's rows — pruning can
    // tighten cost, never answers
    val rnd = new scala.util.Random(42)
    val base = tmp()
    DeltaInterop.overwrite(
      spark.range(300).toDF("k")
        .repartitionByRange(3, col("k")).sortWithinPartitions("k"), base)
    var live = (0L until 300L).toSet
    for (_ <- 1 to 6) {
      val lo = rnd.nextInt(300).toLong
      val hi = lo + rnd.nextInt(80).toLong
      val m = 2 + rnd.nextInt(5)
      DeltaDml.deleteVectoredWhere(spark, base,
        col("k") >= lo && col("k") <= hi && col("k") % m === 0)
      live = live.filterNot(k => k >= lo && k <= hi && k % m == 0)
      val got = DeltaInterop.read(spark, base).as[Long].collect().toSet
      assert(got == live, s"diverged at lo=$lo hi=$hi m=$m")
    }
  }

  test("graft-log: deletes auto-scope through zone maps, no hint needed") {
    import graft.pipeline.GraftLog
    val base = tmp() + "/log"
    GraftLog.overwriteClustered(
      spark.range(400).toDF("k"), base, Seq("k"), nFiles = 4)
    // the analyzable conjunct prunes most files (strict < loosens to an
    // inclusive bound, so a neighbor whose min == 100 may stay admitted)
    assert(GraftLog.candidateFilesFor(base, col("k") < 100).size <= 2)
    assert(GraftLog.candidateFilesFor(base, col("k") <= 50).size == 1)
    assert(GraftLog.candidateFilesFor(base, col("k") % 7 === 0).size == 4)
    GraftLog.delete(spark, base,
      col("k") >= 100 && col("k") < 200 && col("k") % 2 === 0)
    val got = GraftLog.read(spark, base).as[Long].collect().sorted
    val want = (0L until 400L).filterNot(k => k >= 100 && k < 200 && k % 2 == 0)
    assert(got.toSeq == want)
    // merge-on-read variant scopes the same way
    GraftLog.deleteVectored(spark, base, col("k") >= 300 && col("k") % 3 === 0)
    assert(GraftLog.read(spark, base).count() ==
      want.count(k => !(k >= 300 && k % 3 == 0)))
  }

  test("Iceberg: scopedFiles prunes by manifest bounds; DML exact") {
    val base = tmp()
    IcebergInterop.overwrite(
      spark.range(400).toDF("k")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"), base)
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.files.size == 4)
    assert(IcebergInterop.scopedFiles(snap, col("k") < 50).size == 1)
    assert(IcebergInterop.scopedFiles(snap, col("k") % 7 === 0).size == 4)
    // scoped positional DELETE: exact rows, delete files reference only
    // the admitted slice
    IcebergInterop.deletePositionsWhere(spark, base,
      col("k") >= 100 && col("k") < 200 && col("k") % 2 === 0)
    val got = IcebergInterop.read(spark, base).as[Long].collect().sorted
    val want = (0L until 400L).filterNot(k => k >= 100 && k < 200 && k % 2 == 0)
    assert(got.toSeq == want)
    // scoped copy-on-write UPDATE: untouched-and-unadmitted files
    // survive by name
    val before = IcebergInterop.snapshot(spark, base)
    IcebergInterop.updateWhere(spark, base, col("k") < 50,
      Map("k" -> (col("k") + 10000)))
    val after = IcebergInterop.snapshot(spark, base)
    assert(after.files.map(_.rawPath).toSet
      .intersect(before.files.map(_.rawPath).toSet).size == 3)
    assert(IcebergInterop.read(spark, base).count() == want.size)
  }
}
