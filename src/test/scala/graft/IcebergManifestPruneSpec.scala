package graft

import java.io.File

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._
import graft.sources.IcebergInterop

/** Manifest-list partition field summaries (spec field 507) +
  * manifest-level pruning: a partition-filtered read skips WHOLE
  * manifests whose summaries exclude the filter — proven end-to-end by
  * DELETING a manifest that should be pruned and reading through the
  * filter anyway. At thousands of manifests this is the metadata level
  * pruning has to start at, before any entry decode. */
class IcebergManifestPruneSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_mprune_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  /** The current manifest list's rows as (manifest_path, partitions
    * summaries as (contains_null, lower bytes, upper bytes)). */
  private def listRows(base: String)
  : Seq[(String, Option[Seq[(Boolean, Option[Array[Byte]], Option[Array[Byte]])]])] = {
    val metaDir = new File(s"$base/metadata")
    val hint = scala.io.Source.fromFile(new File(metaDir, "version-hint.text"))
    val v = try hint.mkString.trim finally hint.close()
    val meta = new String(java.nio.file.Files.readAllBytes(
      new File(metaDir, s"v$v.metadata.json").toPath))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(meta)
    val cur = node.get("current-snapshot-id").asLong()
    val snaps = node.get("snapshots")
    val ml = (0 until snaps.size()).map(snaps.get)
      .find(_.get("snapshot-id").asLong() == cur).get
      .get("manifest-list").asText()
    val mlFile = if (ml.startsWith("/")) new File(ml)
      else new File(base, ml)
    val rd = new DataFileReader[GenericRecord](mlFile,
      new GenericDatumReader[GenericRecord]())
    try {
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Option[Seq[(Boolean, Option[Array[Byte]], Option[Array[Byte]])]])]
      while (rd.hasNext) {
        val r = rd.next()
        def bytes(o: AnyRef): Option[Array[Byte]] = Option(o).map {
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        }
        val sums = Option(r.get("partitions")).map {
          case l: java.util.Collection[_] =>
            import scala.jdk.CollectionConverters._
            l.asScala.collect { case s: GenericRecord =>
              (s.get("contains_null").toString.toBoolean,
                bytes(s.get("lower_bound")), bytes(s.get("upper_bound")))
            }.toSeq
        }
        out += ((r.get("manifest_path").toString, sums))
      }
      out.toSeq
    } finally rd.close()
  }

  private def leInt(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt

  test("summaries record per-manifest partition ranges; carry survives commits") {
    val base = freshBase("sums")
    // three appends, each covering ONE partition value → 3 manifests
    // with disjoint [lo, hi]
    (0 until 3).foreach { p =>
      IcebergInterop.append(
        (0L until 50L).map(k => (k, p)).toDF("id", "p").coalesce(1),
        base, partitionBy = Seq("p"))
    }
    val rows = listRows(base).filter(_._1.contains("manifest-"))
    assert(rows.size == 3, rows.map(_._1))
    val ranges = rows.flatMap(_._2).map { sums =>
      assert(sums.size == 1)
      val (cn, lo, hi) = sums.head
      assert(!cn)
      (leInt(lo.get), leInt(hi.get))
    }.sorted
    assert(ranges == Seq((0, 0), (1, 1), (2, 2)), ranges)
  }

  test("a filtered read never opens a manifest the summaries exclude") {
    val base = freshBase("prune")
    (0 until 3).foreach { p =>
      IcebergInterop.append(
        (0L until 40L).map(k => (k, p)).toDF("id", "p").coalesce(1),
        base, partitionBy = Seq("p"))
    }
    // destroy the p=0 manifest ON DISK: only a reader that prunes it
    // at the manifest LIST level can still answer a p=2 query
    val rows = listRows(base)
    val doomed = rows.find(_._2.exists(s => leInt(s.head._2.get) == 0)).get._1
    assert(new File(doomed).delete(), s"couldn't delete $doomed")
    val got = IcebergInterop.read(spark, base,
        partitionFilters = Map("p" -> "2"))
      .agg(count(lit(1)), sum("id")).head()
    assert(got.getLong(0) == 40L && got.getLong(1) == (0L until 40L).sum)
    // without the filter the reader must fail loudly (the manifest is
    // genuinely gone — nothing may silently drop its rows)
    intercept[Exception](IcebergInterop.read(spark, base).count())
  }

  test("readEq prunes manifests through a bucket transform") {
    val base = freshBase("bucket")
    import graft.sources.IcebergInterop.IceTransform
    // split ids by their murmur3 bucket (the engine's own expression,
    // so the test can't drift from the writer) and append each group
    // separately → per-manifest bucket summaries are single-valued
    val ids = (0L until 200L).toDF("id")
      .select(col("id"),
        graft.functions.IcebergTransforms.bucket(col("id"), 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val byBucket = ids.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val bA = byBucket.keys.min
    val bB = byBucket.keys.max
    assert(bA != bB)
    def frame(b: Int) =
      byBucket(b).map(k => (k, s"r$k")).toSeq.toDF("id", "s").coalesce(1)
    IcebergInterop.overwriteTransformed(frame(bA), base,
      Seq("id" -> IceTransform.Bucket(4)))
    IcebergInterop.appendTransformed(frame(bB), base,
      Seq("id" -> IceTransform.Bucket(4)))
    // destroy the bucket-bB manifest: only transform-aware manifest
    // pruning can still answer a point lookup for a bucket-bA key
    val rows = listRows(base).filter(_._1.contains("manifest-"))
    assert(rows.size == 2)
    val doomed = rows.find(_._2.exists(s => leInt(s.head._2.get) == bB)).get._1
    assert(new File(doomed).delete())
    val probe = byBucket(bA).head
    val hit = IcebergInterop.readEq(spark, base, Map("id" -> probe))
      .select("id").as[Long].collect().toSeq
    assert(hit == Seq(probe))
    intercept[Exception](IcebergInterop.read(spark, base).count())
  }

  test("readRange prunes manifests by identity partition summaries") {
    val base = freshBase("range")
    // three appends over disjoint p-ranges → disjoint manifest summaries
    Seq(0 -> 1, 2 -> 3, 4 -> 5).foreach { case (a, b) =>
      IcebergInterop.append(
        (0L until 40L).map(k => (k, if (k % 2 == 0) a else b))
          .toDF("id", "p").coalesce(1), base, partitionBy = Seq("p"))
    }
    // destroy BOTH manifests outside [4, 5]: only range pruning at the
    // manifest-list level can still answer
    val rows = listRows(base).filter(_._1.contains("manifest-"))
    assert(rows.size == 3)
    rows.filter(_._2.exists(s => leInt(s.head._3.get) < 4))
      .foreach(r => assert(new File(r._1).delete(), r._1))
    val got = IcebergInterop.readRange(spark, base, "p",
      Some(4), Some(5)).count()
    assert(got == 40L)
    intercept[Exception](IcebergInterop.read(spark, base).count())
  }

  test("readRange prunes manifests through a day transform") {
    val base = freshBase("day")
    import graft.sources.IcebergInterop.IceTransform
    def day(d: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2026-01-${d}%02d 12:00:00")
    def frame(days: Range) =
      days.flatMap(d => (0 until 10).map(i => (d.toLong * 100 + i, day(d))))
        .toDF("id", "ts").coalesce(1)
    IcebergInterop.overwriteTransformed(frame(1 to 5), base,
      Seq("ts" -> IceTransform.Day))
    IcebergInterop.appendTransformed(frame(20 to 25), base,
      Seq("ts" -> IceTransform.Day))
    // destroy the January-1..5 manifest; a late-January range query
    // must prune it via the day-surrogate summaries
    val rows = listRows(base).filter(_._1.contains("manifest-"))
    assert(rows.size == 2)
    val doomed = rows.minBy(r => leInt(r._2.get.head._2.get))._1
    assert(new File(doomed).delete())
    val got = IcebergInterop.readRange(spark, base, "ts",
      Some(day(21)), Some(day(24))).count()
    assert(got == 40L)
    intercept[Exception](IcebergInterop.read(spark, base).count())
  }

  test("null partition values summarize as contains_null and match a null filter") {
    val base = freshBase("nulls")
    val withNull = Seq((1L, java.lang.Integer.valueOf(5)),
      (2L, null.asInstanceOf[java.lang.Integer]))
      .toDF("id", "p")
    IcebergInterop.overwrite(withNull.coalesce(1), base,
      partitionBy = Seq("p"))
    val rows = listRows(base).filter(_._1.contains("manifest-"))
    val sums = rows.flatMap(_._2).head
    assert(sums.head._1, "contains_null must be true")
    assert(leInt(sums.head._2.get) == 5 && leInt(sums.head._3.get) == 5)
  }
}
