package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{DeletionVectors, IcebergInterop, Puffin}

/** Iceberg format-version 3: deletion vectors in puffin files (table
  * spec v3 §Deletion Vectors + the puffin spec). The DV blob framing is
  * byte-identical to Delta's (PROTOCOL.md §Deletion Vector Format) —
  * pinned below — which is what lets CONVERT carry merge-on-read state
  * verbatim between the formats. */
class IcebergV3Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("iceberg_v3_").toFile
    d.deleteOnExit(); d.getPath
  }

  private def meta(base: String): com.fasterxml.jackson.databind.JsonNode = {
    val v = Files.readString(
      new File(base, "metadata/version-hint.text").toPath).trim
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(new File(base, s"metadata/v$v.metadata.json"))
  }

  test("puffin codec: footer round-trips blob locations; CRC + magic validate") {
    val dvs = Seq("data/a.parquet" -> Seq(0L, 3L, 70000L),
      "data/b.parquet" -> (0L until 5000L).filter(_ % 3 == 0))
    val (bytes, locs) = Puffin.dvFileBytes(dvs, snapshotId = 7L,
      sequenceNumber = 7L)
    assert(bytes.startsWith(Puffin.Magic) && bytes.endsWith(Puffin.Magic))
    // footer metadata matches the returned locations exactly
    val footer = Puffin.blobs(bytes)
    assert(footer.map(f => (f._1, f._2, f._3)) ==
      locs.map(l => (Puffin.DvBlobType, l.offset, l.length)))
    assert(footer.map(_._4("referenced-data-file")) ==
      dvs.map(_._1))
    assert(footer.map(_._4("cardinality").toLong) ==
      dvs.map(_._2.distinct.size.toLong))
    // each blob decodes back to its positions through the manifest path
    locs.zip(dvs).foreach { case (l, (_, ps)) =>
      assert(Puffin.readDvBlob(bytes, l.offset, l.length, "t").toSeq ==
        ps.distinct.sorted)
    }
    // a flipped byte in the bitmap fails the CRC loudly
    val corrupt = bytes.clone()
    corrupt(locs.head.offset.toInt + 9) =
      (corrupt(locs.head.offset.toInt + 9) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException] {
      Puffin.readDvBlob(corrupt, locs.head.offset, locs.head.length, "t")
    }
    assert(e.getMessage.contains("checksum"))
  }

  test("v3 DV blob bytes are BIT-IDENTICAL to a Delta deletion-vector blob") {
    val positions = Seq(1L, 5L, 9L, 100000L)
    // Delta .bin layout: version byte, then [len BE][magic+bitmap][crc BE]
    val (deltaBin, off) = DeletionVectors.dvFileBytes(positions)
    val deltaBlob = deltaBin.slice(off, deltaBin.length) // strip version byte
    assert(Puffin.dvBlobBytes(positions).toSeq == deltaBlob.toSeq,
      "the v3 spec adopted Delta's framing — the blobs must match byte for byte")
    // and the Delta reader decodes the puffin blob (offset 0: no version byte)
    val (puffinBytes, locs) =
      Puffin.dvFileBytes(Seq("f" -> positions), 1L, 1L)
    val blob = puffinBytes.slice(locs.head.offset.toInt,
      (locs.head.offset + locs.head.length).toInt)
    assert(DeletionVectors.readDvBlob(1.toByte +: blob, 1, "t").toSeq ==
      positions.sorted)
  }

  test("v3 table: DELETE writes a deletion vector; reads subtract it") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(100).toDF("id").coalesce(2), base,
      formatVersion = 3)
    assert(meta(base).get("format-version").asInt() == 3)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") % 10 === 0)
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.formatVersion == 3)
    assert(snap.deletes.nonEmpty && snap.deletes.forall(_.dv),
      s"expected deletion vectors, got ${snap.deletes}")
    assert(snap.deletes.forall(_.path.endsWith(".puffin")))
    val got = IcebergInterop.read(spark, base).as[Long].collect().toSet
    assert(got == (0L until 100L).filterNot(_ % 10 == 0).toSet)
    // time travel to the pre-delete snapshot still sees every row
    val first = IcebergInterop.snapshotIds(base).head
    assert(IcebergInterop.read(spark, base, Some(first)).count() == 100)
  }

  test("second DV delete on the same file MERGES: one vector per file, old ∪ new") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(50).toDF("id").coalesce(1), base,
      formatVersion = 3)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 5)
    IcebergInterop.deletePositionsWhere(spark, base,
      col("id") >= 40 && col("id") < 45)
    val snap = IcebergInterop.snapshot(spark, base)
    // at most one DV per data file (spec v3): the second delete REPLACED
    // the first file's vector instead of stacking a second one
    val byRef = snap.deletes.filter(_.dv).groupBy(_.referencedDataFile.get)
    assert(byRef.values.forall(_.size == 1),
      s"multiple DVs for one file: ${snap.deletes}")
    assert(snap.deletes.map(_.recordCount).sum == 10,
      "the merged vector must carry old ∪ new cardinality")
    val got = IcebergInterop.read(spark, base).as[Long].collect().toSet
    assert(got == (5L until 40L).toSet ++ (45L until 50L).toSet)
  }

  test("v2 → v3 upgrade: old position deletes apply; first v3 delete folds them") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(30).toDF("id").coalesce(1), base) // v2
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 3)
    IcebergInterop.upgradeFormatVersion(base, 3)
    // the v2-era parquet position deletes still subtract
    assert(IcebergInterop.read(spark, base).count() == 27)
    // the first v3 delete folds them into the new vector (supersedes)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") >= 28)
    val snap = IcebergInterop.snapshot(spark, base)
    val dv = snap.deletes.filter(_.dv)
    assert(dv.size == 1 && dv.head.recordCount == 5,
      s"vector must fold the 3 legacy + 2 new positions, got $dv")
    val got = IcebergInterop.read(spark, base).as[Long].collect().toSet
    assert(got == (3L until 28L).toSet)
    // downgrade refuses
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.upgradeFormatVersion(base, 2)
    }
    assert(e.getMessage.contains("downgrade"))
  }

  test("position-delete FILES refuse on v3 (the spec forbids new ones)") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base,
      formatVersion = 3)
    val raw = IcebergInterop.snapshot(spark, base).files.head.rawPath
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.addPositionDeletes(spark, base, Seq(raw -> Seq(0L)))
    }
    assert(e.getMessage.contains("v2"))
  }

  test("v3 rewrite folds the vector; maintenance drops the superseded DV entry") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(40).toDF("id")
      .repartition(2), base, formatVersion = 3)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") % 4 === 1)
    IcebergInterop.rewriteDataFiles(spark, base)
    val snap = IcebergInterop.snapshot(spark, base)
    assert(snap.deletes.isEmpty,
      s"rewrite must fold + drop the vector, got ${snap.deletes}")
    assert(IcebergInterop.read(spark, base).count() == 30)
    assert(IcebergInterop.read(spark, base).agg(sum("id")).head().getLong(0) ==
      (0L until 40L).filterNot(_ % 4 == 1).sum)
  }

  test("v3 UPDATE (copy-on-write) over a DV table keeps the masked rows dead") {
    val base = tmp()
    IcebergInterop.overwrite(
      (0L until 20L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1), base,
      formatVersion = 3)
    IcebergInterop.deletePositionsWhere(spark, base, col("k") < 4)
    IcebergInterop.updateWhere(spark, base, col("k") >= 18,
      Map("v" -> (col("v") + 100.0)))
    val got = IcebergInterop.read(spark, base)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == (4L until 20L).toSet)
    assert(got(18L) == 118.0 && got(19L) == 119.0 && got(4L) == 4.0)
  }

  test("v3 changelog: DV commits emit exactly the newly-masked rows") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(20).toDF("id").coalesce(1), base,
      formatVersion = 3)
    IcebergInterop.deletePositionsWhere(spark, base, col("id") < 3)  // DV 1
    IcebergInterop.deletePositionsWhere(spark, base, col("id") >= 18) // DV 2 (merged)
    val ids = IcebergInterop.snapshotIds(base)
    val chg = IcebergInterop.readChangelog(spark, base, ids.head)
      .select(col("id"), col("_change_type"), col("_snapshot_id"))
      .as[(Long, String, Long)].collect().toSet
    // the second vector is old ∪ new — only the NEW positions re-emit
    assert(chg == Set(
      (0L, "delete", ids(1)), (1L, "delete", ids(1)), (2L, "delete", ids(1)),
      (18L, "delete", ids(2)), (19L, "delete", ids(2))), s"got $chg")
  }

  test("CONVERT Delta→Iceberg v3 carries the DV blob BYTE-VERBATIM") {
    import graft.sources.{DeltaDml, DeltaInterop}
    val src = tmp() + "/delta"; val dst = tmp() + "/ice3"
    DeltaInterop.overwrite(
      (0L until 30L).map(i => (i, i * 2.0)).toDF("k", "v").coalesce(1), src)
    DeltaDml.deleteVectoredWhere(spark, src, col("k") % 5 === 2)
    IcebergInterop.convertFromDelta(spark, src, dst, formatVersion = 3)
    val snap = IcebergInterop.snapshot(spark, dst)
    assert(snap.formatVersion == 3)
    assert(snap.deletes.size == 1 && snap.deletes.head.dv)
    // value-exact across the convert
    val got = IcebergInterop.read(spark, dst).as[(Long, Double)]
      .collect().toSet
    assert(got == (0L until 30L).filterNot(_ % 5 == 2)
      .map(i => (i, i * 2.0)).toSet)
    // the puffin blob equals the Delta .bin frame byte for byte
    val d = snap.deletes.head
    val puffinBlob = java.nio.file.Files.readAllBytes(
      new File(d.path).toPath).slice(d.contentOffset.get.toInt,
      (d.contentOffset.get + d.contentSize.get).toInt)
    val deltaDv = DeltaInterop.snapshot(spark, src).files.head.dv.get
    val bin = new File(src).listFiles()
      .find(_.getName.startsWith("deletion_vector_")).get
    val binBytes = java.nio.file.Files.readAllBytes(bin.toPath)
    val deltaBlob = binBytes.slice(deltaDv.offset.getOrElse(1),
      deltaDv.offset.getOrElse(1) + 4 + deltaDv.sizeInBytes + 4)
    assert(puffinBlob.toSeq == deltaBlob.toSeq,
      "convert must carry the vector verbatim, not re-encode it")
    // and no data file was rewritten (zero copy)
    assert(snap.files.forall(_.path.startsWith(
      graft.sources.PathCodec.absNorm(src))))
  }

  test("CONVERT Iceberg v3→Delta carries the vector back verbatim") {
    import graft.sources.DeltaInterop
    val src = tmp() + "/ice3"; val dst = tmp() + "/delta"
    IcebergInterop.overwrite(spark.range(25).toDF("id").coalesce(1), src,
      formatVersion = 3)
    IcebergInterop.deletePositionsWhere(spark, src, col("id") >= 20)
    DeltaInterop.convertFromIceberg(spark, src, dst)
    val got = DeltaInterop.read(spark, dst).as[Long].collect().toSet
    assert(got == (0L until 20L).toSet)
    // the .bin frame equals the puffin blob byte for byte
    val d = IcebergInterop.snapshot(spark, src).deletes.head
    val puffinBlob = java.nio.file.Files.readAllBytes(
      new File(d.path).toPath).slice(d.contentOffset.get.toInt,
      (d.contentOffset.get + d.contentSize.get).toInt)
    val dv = DeltaInterop.snapshot(spark, dst).files.head.dv.get
    val bin = new File(dst).listFiles()
      .find(_.getName.startsWith("deletion_vector_")).get
    val binBytes = java.nio.file.Files.readAllBytes(bin.toPath)
    assert(binBytes.drop(1).toSeq == puffinBlob.toSeq &&
      dv.cardinality == 5)
    // the converted Delta table's own DML composes on the carried DV
    graft.sources.DeltaDml.deleteVectoredWhere(spark, dst, col("id") < 2)
    assert(DeltaInterop.read(spark, dst).as[Long].collect().toSet ==
      (2L until 20L).toSet)
  }

  test("SQL: CONVERT TO ICEBERG3, format-version upgrade, DV DELETE statement") {
    import graft.pipeline.GraftSql
    import graft.sources.{DeltaDml, DeltaInterop}
    val src = tmp() + "/delta"; val dst = tmp() + "/ice3"
    DeltaInterop.overwrite(
      (0L until 40L).map(i => (i, s"r$i")).toDF("k", "s").coalesce(1), src)
    DeltaDml.deleteVectoredWhere(spark, src, col("k") === 39L)
    GraftSql.registerDeltaTable(spark, "v3src", src)
    GraftSql.sql(spark,
      s"CONVERT v3src TO ICEBERG3 AS v3dst LOCATION '$dst'")
    assert(meta(dst).get("format-version").asInt() == 3)
    // a DELETE STATEMENT on the registered v3 table writes a vector
    GraftSql.sql(spark, "DELETE FROM v3dst WHERE k < 4")
    val snap = IcebergInterop.snapshot(spark, dst)
    assert(snap.formatVersion == 3 && snap.deletes.forall(_.dv))
    assert(spark.sql("SELECT count(*) FROM v3dst").head().getLong(0) == 35)
    // and the in-place upgrade statement on a v2 table
    val v2 = tmp() + "/ice2"
    IcebergInterop.overwrite(spark.range(8).toDF("id").coalesce(1), v2)
    GraftSql.registerIcebergTable(spark, "v3up", v2)
    GraftSql.sql(spark,
      "ALTER TABLE v3up SET TBLPROPERTIES ('format-version'='3')")
    GraftSql.sql(spark, "DELETE FROM v3up WHERE id = 0")
    val up = IcebergInterop.snapshot(spark, v2)
    assert(up.formatVersion == 3 && up.deletes.forall(_.dv))
    assert(spark.sql("SELECT count(*) FROM v3up").head().getLong(0) == 7)
  }

  test("v3 DV delete racing a disjoint append rebases — both land") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base,
      formatVersion = 3)
    val raced = new java.util.concurrent.atomic.AtomicBoolean(false)
    val prior = graft.sources.TableIO.current
    graft.sources.TableIO.current = new RaceProxy(() =>
      IcebergInterop.append(spark.range(100, 105).toDF("id").coalesce(1),
        base))
    try IcebergInterop.deletePositionsWhere(spark, base, col("id") < 4)
    finally graft.sources.TableIO.current = prior
    val got = IcebergInterop.read(spark, base)
    assert(got.count() == 11)
    assert(got.agg(sum("id")).head().getLong(0) ==
      (4L until 10L).sum + (100L until 105L).sum)
    assert(IcebergInterop.snapshot(spark, base).deletes.forall(_.dv))
  }

  test("v3 DV delete racing a DV rewrite of the same file refuses") {
    val base = tmp()
    IcebergInterop.overwrite(spark.range(10).toDF("id").coalesce(1), base,
      formatVersion = 3)
    val prior = graft.sources.TableIO.current
    graft.sources.TableIO.current = new RaceProxy(() =>
      IcebergInterop.deletePositionsWhere(spark, base, col("id") === 9L))
    val e = intercept[java.util.ConcurrentModificationException] {
      try IcebergInterop.deletePositionsWhere(spark, base, col("id") < 4)
      finally graft.sources.TableIO.current = prior
    }
    assert(e.getMessage.contains("deletion vector") ||
      e.getMessage.contains("vector"))
    // the winner's delete is intact
    assert(IcebergInterop.read(spark, base).count() == 9)
  }

  /** Same injection seam as IcebergOccSpec: the competing commit runs
    * inside the loser's metadata publish. */
  private final class RaceProxy(inject: () => Unit)
      extends graft.sources.TableIO {
    private val under = graft.sources.LocalTableIO
    @volatile private var injected = false
    def exists(p: String) = under.exists(p)
    def isDirectory(p: String) = under.isDirectory(p)
    def list(d: String) = under.list(d)
    def length(p: String) = under.length(p)
    def lastModified(p: String) = under.lastModified(p)
    def mkdirs(d: String) = under.mkdirs(d)
    def readBytes(p: String) = under.readBytes(p)
    def readString(p: String) = under.readString(p)
    def readLines(p: String) = under.readLines(p)
    def writeBytes(p: String, b: Array[Byte]) = under.writeBytes(p, b)
    def putIfAbsent(s: String, d: String) = {
      if (!injected && d.endsWith(".metadata.json")) {
        injected = true
        inject()
      }
      under.putIfAbsent(s, d)
    }
    def mirror(s: String, d: String) = under.mirror(s, d)
    def moveReplace(s: String, d: String) = under.moveReplace(s, d)
    def move(s: String, d: String) = under.move(s, d)
    def delete(p: String) = under.delete(p)
    def deleteRecursively(p: String) = under.deleteRecursively(p)
  }

  test("v3 equality deletes stay legal and compose with vectors") {
    val base = tmp()
    IcebergInterop.overwrite(
      (0L until 12L).map(i => (i, s"u$i")).toDF("k", "name").coalesce(1),
      base, formatVersion = 3)
    IcebergInterop.addEqualityDeletes(spark,
      base, Seq((3L, "ignored")).toDF("k", "name").select(col("k")), Seq("k"))
    IcebergInterop.deletePositionsWhere(spark, base, col("k") === 7L)
    val got = IcebergInterop.read(spark, base).select("k")
      .as[Long].collect().toSet
    assert(got == (0L until 12L).toSet -- Set(3L, 7L))
  }
}
