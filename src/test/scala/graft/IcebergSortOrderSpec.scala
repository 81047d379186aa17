package graft

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.pipeline.GraftSql
import graft.sources.IcebergInterop

/** Iceberg sort orders (spec §Sorting) + the write-layout DDL:
  * `WRITE ORDERED BY` range-distributes and sorts so per-file value
  * ranges are globally DISJOINT (the layout readRange prunes best),
  * data-file entries stamp `sort_order_id`, the order survives data
  * commits, and `WRITE UNORDERED` resets it. An order the writer
  * cannot honor in full degrades to unsorted rather than stamping a
  * lie. */
class IcebergSortOrderSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(name: String): String = {
    val p = s"/tmp/graft_test_sorder_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
    p
  }

  private def leLong(b: Array[Byte]): Long =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong

  test("WRITE ORDERED BY: disjoint per-file id ranges + stamped entries") {
    val base = freshBase("ordered")
    val df = (0L until 40000L).map(k => (k, k % 7)).toDF("id", "v")
    IcebergInterop.overwrite(df.orderBy(rand(42)).repartition(4), base)
    GraftSql.registerIcebergTable(spark, "sorder_t", base)
    GraftSql.sql(spark, "ALTER TABLE sorder_t WRITE ORDERED BY id")
    IcebergInterop.overwrite(df.orderBy(rand(43)).repartition(4), base)
    val files = IcebergInterop.snapshot(spark, base).files
    assert(files.forall(_.sortOrderId.contains(1)), files.map(_.sortOrderId))
    // field id 1 = `id`; ranges must not overlap across files
    val ranges = files.map(f =>
      (leLong(f.lowerBounds(1)), leLong(f.upperBounds(1)))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, ranges.toString)
      case _ =>
    }
    assert(IcebergInterop.read(spark, base).count() == 40000L)
  }

  test("order survives appends; WRITE UNORDERED resets the stamp") {
    val base = freshBase("lifecycle")
    val df = (0L until 500L).map(k => (k, k % 3)).toDF("id", "v")
    IcebergInterop.overwrite(df.coalesce(1), base)
    IcebergInterop.setSortOrder(base, Seq("id" -> true))
    IcebergInterop.append(df.repartition(2), base)
    // a plain data commit must not drop the order: the NEXT append
    // still sorts and stamps
    IcebergInterop.append(df.repartition(2), base)
    val stamped = IcebergInterop.snapshot(spark, base).files
      .count(_.sortOrderId.contains(1))
    assert(stamped >= 2, s"appends after a data commit lost the order")
    GraftSql.registerIcebergTable(spark, "sorder_l", base)
    GraftSql.sql(spark, "ALTER TABLE sorder_l WRITE UNORDERED")
    IcebergInterop.append(df.coalesce(1), base)
    val after = IcebergInterop.snapshot(spark, base).files
    assert(after.count(_.sortOrderId.isDefined) == stamped,
      "a write after UNORDERED still stamped an order id")
  }

  test("DISTRIBUTED BY PARTITION LOCALLY ORDERED BY: hash + local sort") {
    val base = freshBase("hashlocal")
    val df = (0L until 3000L).map(k => (k, (k % 3).toInt)).toDF("id", "p")
    IcebergInterop.overwrite(df.coalesce(1), base, partitionBy = Seq("p"))
    GraftSql.registerIcebergTable(spark, "sorder_h", base)
    GraftSql.sql(spark,
      "ALTER TABLE sorder_h WRITE DISTRIBUTED BY PARTITION LOCALLY ORDERED BY id DESC")
    IcebergInterop.append(df.repartition(4), base, partitionBy = Seq("p"))
    val appended = IcebergInterop.snapshot(spark, base).files
      .filter(_.sortOrderId.isDefined)
    // hash distribution: ONE file per partition tuple for the append
    assert(appended.size == 3, appended.map(_.partitionValues))
    assert(IcebergInterop.read(spark, base).count() == 6000L)
  }

  test("column-less sorted compaction uses the table order and stamps it") {
    val base = freshBase("compact")
    val df = (0L until 2000L).map(k => (k, k % 5)).toDF("id", "v")
    // unsorted table: no default order yet → column-less rewrite refuses
    IcebergInterop.overwrite(df.orderBy(rand(7)).repartition(3), base)
    val e = intercept[IllegalArgumentException](
      IcebergInterop.rewriteDataFilesSorted(spark, base))
    assert(e.getMessage.contains("no default sort order"))
    IcebergInterop.setSortOrder(base, Seq("id" -> true))
    IcebergInterop.rewriteDataFilesSorted(spark, base, filesPerPartition = 4)
    val files = IcebergInterop.snapshot(spark, base).files
    assert(files.forall(_.sortOrderId.contains(1)), files.map(_.sortOrderId))
    val ranges = files.map(f =>
      (leLong(f.lowerBounds(1)), leLong(f.upperBounds(1)))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, ranges.toString)
      case _ =>
    }
    // a DESC order refuses the implicit direction
    IcebergInterop.setSortOrder(base, Seq("v" -> false))
    val e2 = intercept[IllegalArgumentException](
      IcebergInterop.rewriteDataFilesSorted(spark, base))
    assert(e2.getMessage.contains("DESC"))
  }

  test("an order on a column the frame lacks degrades to unsorted") {
    val base = freshBase("degrade")
    IcebergInterop.overwrite(
      (0L until 50L).map(k => (k, k * 2)).toDF("id", "v").coalesce(1), base)
    IcebergInterop.setSortOrder(base, Seq("v" -> true))
    // overwrite re-mints the schema WITHOUT the order's column
    IcebergInterop.overwrite(
      (0L until 50L).toDF("only_id").coalesce(1), base)
    val files = IcebergInterop.snapshot(spark, base).files
    assert(files.forall(_.sortOrderId.isEmpty), files.map(_.sortOrderId))
    // unknown sort column refuses at DDL time
    val e = intercept[IllegalArgumentException](
      IcebergInterop.setSortOrder(base, Seq("nope" -> true)))
    assert(e.getMessage.contains("nope"))
  }
}
