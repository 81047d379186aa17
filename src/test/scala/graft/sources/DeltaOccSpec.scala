package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Optimistic-concurrency reconciliation for Delta commits: a loser of
  * the version race re-reads the winner and either rebases (disjoint
  * file sets) or refuses with the conflict named. The race is
  * constructed DETERMINISTICALLY: the loser's commit lines are staged
  * first, a winner commits in between, then the staged lines go through
  * `commitReconciled` at the now-stale expected version. */
class DeltaOccSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("docc_").toFile
    d.deleteOnExit(); d.getPath
  }

  test("disjoint interleaved appends both land (loser rebases)") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base) // v0
    // loser stages its files + commit lines against head = v0
    val loserAdds = DeltaInterop.collectAddStats(spark, base,
      DeltaInterop.stageAdds(
        spark.range(100, 105).toDF("id").coalesce(1), base, Seq.empty),
      StructType(Seq(org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false))))
    val loserLines = loserAdds.map(DeltaInterop.addJson(_, base))
    // winner lands v1 first
    DeltaInterop.append(spark.range(200, 203).toDF("id").coalesce(1), base)
    // loser attempts v1, collides, sees only disjoint adds → rebases to v2
    val v = DeltaInterop.commitReconciled(base, 1L, loserLines,
      operation = "WRITE", removedPaths = Set.empty)
    assert(v == 2L)
    val got = DeltaInterop.read(spark, base).select("id").as[Long]
      .collect().sorted.toSeq
    assert(got == ((0L until 10L) ++ (100L until 105L) ++ (200L until 203L)))
  }

  test("a winner that changed table metadata refuses the staged commit") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(5).toDF("id").coalesce(1), base) // v0
    val loserAdds = DeltaInterop.stageAdds(
      spark.range(50, 55).toDF("id").coalesce(1), base, Seq.empty)
    val loserLines = loserAdds.map(DeltaInterop.addJson(_, base))
    // winner: overwrite (carries a metaData action) lands v1
    DeltaInterop.overwrite(spark.range(9).toDF("id").coalesce(1), base)
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaInterop.commitReconciled(base, 1L, loserLines,
        operation = "WRITE", removedPaths = Set.empty)
    }
    assert(e.getMessage.contains("metadata"))
  }

  test("overlapping rewrites refuse with the conflicting file named") {
    val base = tmp()
    // two small files → OPTIMIZE (the winner) compacts and removes both
    DeltaInterop.overwrite(spark.range(6).toDF("id").coalesce(1), base)  // v0
    DeltaInterop.append(spark.range(6, 12).toDF("id").coalesce(1), base) // v1
    val f = DeltaInterop.snapshot(spark, base).files.head
    // loser intends to rewrite file f (remove + re-add elsewhere)
    val loserLines = Seq(DeltaInterop.removeJson(f.path, f.dv, dataChange = true))
    // winner: optimize removes BOTH files (no metaData line) at v2
    assert(DeltaInterop.optimize(spark, base).nonEmpty)
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaInterop.commitReconciled(base, 2L, loserLines,
        operation = "DELETE", removedPaths = Set(f.path))
    }
    assert(e.getMessage.contains(f.path) &&
      e.getMessage.contains("conflicting"))
    // the table is untouched by the refused commit
    assert(DeltaInterop.read(spark, base).count() == 12)
  }
}
