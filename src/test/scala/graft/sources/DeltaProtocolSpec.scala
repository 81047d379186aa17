package graft.sources

import java.io.File
import java.nio.file.Files
import java.util.concurrent.{CyclicBarrier, TimeUnit}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

/** The Delta protocol's writer contract in this engine's DML layer:
  * a protocol-upgrading commit must carry every declared (and
  * legacy-implied) feature forward — replacing the table's protocol
  * with a fixed DV-only action would silently erase declarations like
  * writerFeatures=["invariants"] for all later readers/writers — and a
  * writer must refuse tables whose declared writer features it cannot
  * uphold. Plus: a LOSING optimistic-concurrency attempt must remove
  * the files it staged (DV bins, change data) instead of leaving them
  * unreferenced until a vacuum. */
class DeltaProtocolSpec extends graft.SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def tmp(): String = {
    val d = Files.createTempDirectory("dproto_").toFile
    d.deleteOnExit(); d.getPath
  }

  private def lastCommitProtocol(base: String): Option[(Int, Int, Set[String], Set[String])] = {
    val dir = new java.io.File(DeltaInterop.logDir(base))
    val last = dir.listFiles().filter(_.getName.endsWith(".json"))
      .maxBy(_.getName)
    Files.readAllLines(last.toPath).toArray.map(_.toString).collectFirst {
      case l if l.contains("\"protocol\"") =>
        val p = mapper.readTree(l).get("protocol")
        def feats(k: String): Set[String] =
          Option(p.get(k)).map(n =>
            (0 until n.size()).map(n.get(_).asText()).toSet).getOrElse(Set.empty)
        (p.get("minReaderVersion").asInt(), p.get("minWriterVersion").asInt(),
          feats("readerFeatures"), feats("writerFeatures"))
    }
  }

  test("DV upgrade unions declared writer features instead of erasing them") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(20).toDF("id").coalesce(1), base) // v0
    // external writer declares table-features protocol with invariants
    DeltaInterop.writeCommit(base, 1L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
      """"writerFeatures":["invariants"]}}"""), operation = "UPGRADE")
    DeltaDml.deleteVectoredWhere(spark, base, col("id") < 5)
    val (r, w, rf, wf) = lastCommitProtocol(base).get
    assert(r == 3 && w == 7)
    assert(rf == Set("deletionVectors"), s"readerFeatures: $rf")
    assert(wf == Set("invariants", "deletionVectors"),
      s"invariants declaration must survive the upgrade: $wf")
    // table still reads, delete applied
    assert(DeltaInterop.read(spark, base).count() == 15)
  }

  test("legacy writer version implies appendOnly+invariants on upgrade") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base) // v1/v2
    DeltaDml.deleteVectoredWhere(spark, base, col("id") === 0)
    val (r, w, rf, wf) = lastCommitProtocol(base).get
    assert((r, w) == (3, 7))
    assert(rf == Set("deletionVectors"))
    // PROTOCOL.md: upgrading a legacy protocol to table features must
    // list the features the old version implied
    assert(wf == Set("appendOnly", "invariants", "deletionVectors"), s"$wf")
  }

  test("declared writer features this engine cannot uphold refuse DML") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base)
    DeltaInterop.writeCommit(base, 1L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
      """"writerFeatures":["rowTracking"]}}"""), operation = "UPGRADE")
    val e = intercept[IllegalArgumentException] {
      DeltaDml.deleteVectoredWhere(spark, base, col("id") < 5)
    }
    assert(e.getMessage.contains("rowTracking"))
  }

  test("delta.appendOnly refuses deletes/updates/merges") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base,
      configuration = Map("delta.appendOnly" -> "true"))
    for (op <- Seq(
        () => DeltaDml.deleteVectoredWhere(spark, base, col("id") < 5),
        () => DeltaDml.updateWhere(spark, base, col("id") < 5,
          Map("id" -> lit(99L))),
        () => DeltaDml.mergeUpsert(spark, base,
          Seq(1L).toDF("id"), "id"))) {
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("append-only"))
    }
    // appends still work on an append-only table
    DeltaInterop.append(spark.range(10, 12).toDF("id").coalesce(1), base)
    assert(DeltaInterop.read(spark, base).count() == 12)
  }

  test("CHECK constraints validate DML post-images; DELETE skips the probe") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base,
      configuration = Map("delta.constraints.idpos" -> "id >= 0"))
    // a violating post-image fails BEFORE anything commits
    val v0 = DeltaInterop.snapshot(spark, base).version
    val e = intercept[IllegalArgumentException] {
      DeltaDml.updateWhere(spark, base, col("id") < 5, Map("id" -> lit(-1L)))
    }
    assert(e.getMessage.contains("idpos"))
    assert(DeltaInterop.snapshot(spark, base).version == v0,
      "a refused update must not commit")
    // a satisfying update goes through
    DeltaDml.updateWhere(spark, base, col("id") < 5,
      Map("id" -> (col("id") + lit(100L))))
    assert(DeltaInterop.read(spark, base).where(col("id") < 0).count() == 0)
    assert(DeltaInterop.read(spark, base).count() == 10)
    // a DELETE can never violate a row constraint — no probe, allowed
    DeltaDml.deleteVectoredWhere(spark, base, col("id") === 103)
    assert(DeltaInterop.read(spark, base).count() == 9)
  }

  test("checkpoint preserves the RECORDED protocol, not a reconstruction") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(8).toDF("id").coalesce(1), base)
    DeltaInterop.writeCommit(base, 1L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
      """"writerFeatures":["invariants","checkConstraints"]}}"""),
      operation = "UPGRADE")
    DeltaInterop.checkpoint(spark, base)
    // drop the JSON history the checkpoint covers — replay must now
    // recover the protocol from the checkpoint parquet alone
    new java.io.File(DeltaInterop.logDir(base)).listFiles()
      .filter(_.getName.endsWith(".json")).foreach(_.delete())
    val snap = DeltaInterop.snapshot(spark, base)
    assert(snap.minWriterVersion == 7)
    assert(snap.writerFeatureSet == Set("invariants", "checkConstraints"),
      s"checkpoint lost the declaration: ${snap.writerFeatureSet}")
  }

  test("losing OCC delete attempt discards its staged DV bin") {
    val base = tmp()
    DeltaInterop.overwrite(spark.range(100).toDF("id").coalesce(1), base)
    // both deletes pass a barrier inside their classification scan, so
    // both snapshot v0 before either commits: exactly one loses the
    // version race, cleans up, and retries against the winner's head
    val gate = udf((side: Int) => { DmlRaceGate.await(side); true })
    def run(side: Int, pred: org.apache.spark.sql.Column): Thread = {
      val t = new Thread(() =>
        DeltaDml.deleteVectoredWhere(spark, base, gate(lit(side)) && pred))
      t.start(); t
    }
    val a = run(0, col("id") < 40)
    val b = run(1, col("id") >= 60)
    a.join(120000); b.join(120000)
    assert(!a.isAlive && !b.isAlive, "race threads did not finish")
    val got = DeltaInterop.read(spark, base).as[Long].collect().sorted.toSeq
    assert(got == (40L until 60L), s"wrong rows survived: $got")
    // exactly 2 bins remain: the winner's and the loser's RETRY bin —
    // the loser's first-attempt bin was discarded on the version race
    val bins = new File(base).listFiles()
      .filter(_.getName.startsWith("deletion_vector_")).map(_.getName).toSet
    assert(bins.size == 2, s"losing attempt leaked a DV bin: $bins")
  }
}

/** Two-party rendezvous for the OCC race test: each side awaits once
  * (its first classification scan); retries skip the gate. Object state
  * is shared driver/executor in local mode. */
object DmlRaceGate {
  private val barrier = new CyclicBarrier(2)
  private val arrived = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  def await(side: Int): Unit =
    if (arrived.add(side)) barrier.await(60, TimeUnit.SECONDS)
}
