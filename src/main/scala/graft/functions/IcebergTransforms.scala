package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg partition-transform arithmetic, per the PUBLIC Iceberg Table
  * Spec (Appendix B "32-bit Hash Requirements" + §Partition Transforms):
  *
  *  - bucket[N](v)  = (murmur3_x86_32(bytes(v), seed=0) & Int.MaxValue) % N
  *    where bytes(int|long|date|timestamp) = 8-byte little-endian of the
  *    long value, bytes(string) = UTF-8.
  *  - truncate[W](int|long) = v - (((v % W) + W) % W)   (floor to W)
  *  - truncate[W](string)   = first W characters
  *  - day(timestamp)        = days from 1970-01-01 (int)
  *
  * The hash must be Iceberg's EXACT murmur3_x86_32 — Spark's own `hash()`
  * uses seed 42 and a different byte walk — so it is implemented here
  * from the public algorithm and pinned in spec against the known-answer
  * vectors the Iceberg spec publishes (hash(34L) = 2017239379,
  * hash("iceberg") = 1210000089).
  *
  * `IcebergBucket` is a codegen'd Catalyst expression (no UDF): bucket
  * assignment runs inside whole-stage codegen when a write plans
  * bucket-partitioned output at 100 TB.
  */
object IcebergTransforms {

  /** murmur3_x86_32 (Austin Appleby's public-domain algorithm), the
    * 32-bit hash the Iceberg spec mandates for bucket transforms. */
  def murmur3(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      var k1 = (data(4 * i) & 0xff) |
        ((data(4 * i + 1) & 0xff) << 8) |
        ((data(4 * i + 2) & 0xff) << 16) |
        ((data(4 * i + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem = data.length & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Iceberg hashes every integral type through its 8-byte little-endian
    * long form (so bucket(34:int) == bucket(34L) — spec Appendix B). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  def hashBytes(b: Array[Byte]): Int = murmur3(b)

  def bucketLong(v: Long, n: Int): Int = ((hashLong(v) & Int.MaxValue) % n)

  def bucketUtf8(s: UTF8String, n: Int): Int =
    ((murmur3(s.getBytes) & Int.MaxValue) % n)

  def bucketString(s: String, n: Int): Int =
    ((murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) & Int.MaxValue) % n)

  def truncateLong(v: Long, w: Int): Long = v - (((v % w) + w) % w)

  /** truncate[W] on strings counts CHARACTERS (code points), matching
    * both the Iceberg spec and Spark's `substring` on the write path —
    * a UTF-16 `String.substring` would split surrogate pairs and
    * disagree with the manifest value for supplementary characters,
    * silently pruning away matching files on read. */
  def truncateString(s: String, w: Int): String =
    if (s.codePointCount(0, s.length) <= w) s
    else s.substring(0, s.offsetByCodePoints(0, w))

  def dayOfMicros(micros: Long): Int =
    Math.floorDiv(micros, 86400000000L).toInt

  def hourOfMicros(micros: Long): Int =
    Math.floorDiv(micros, 3600000000L).toInt

  /** year/month transforms count civil years/months from 1970-01-01 of
    * the UTC datetime (spec Appendix B: month(2017-11-16) = 574,
    * year(2017-11-16) = 47) — derived from the epoch DAY so the
    * arithmetic is timezone-free and exact for negative (pre-epoch)
    * values too. */
  def yearOfDays(epochDay: Int): Int =
    java.time.LocalDate.ofEpochDay(epochDay.toLong).getYear - 1970

  def monthOfDays(epochDay: Int): Int = {
    val d = java.time.LocalDate.ofEpochDay(epochDay.toLong)
    (d.getYear - 1970) * 12 + d.getMonthValue - 1
  }

  def yearOfMicros(micros: Long): Int = yearOfDays(dayOfMicros(micros))

  def monthOfMicros(micros: Long): Int = monthOfDays(dayOfMicros(micros))

  /** Column form of bucket[n] over int/long/date/timestamp/string. */
  def bucket(c: Column, n: Int): Column =
    GraftBridge.column(IcebergBucket(GraftBridge.expression(c), n))
}

/** bucket[n] as a native codegen'd expression: int/long/date/timestamp
  * children hash via their long form, strings via UTF-8 bytes. */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"bucket[$n]: n must be positive")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"iceberg_bucket_$n"

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg bucket does not support ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType => IcebergTransforms.bucketLong(v.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType => IcebergTransforms.bucketLong(v.asInstanceOf[Long], n)
    case StringType => IcebergTransforms.bucketUtf8(v.asInstanceOf[UTF8String], n)
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.IcebergTransforms"
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case IntegerType | DateType =>
        s"${ev.value} = $helper.bucketLong((long) $c, $n);"
      case LongType | TimestampType =>
        s"${ev.value} = $helper.bucketLong($c, $n);"
      case StringType =>
        s"${ev.value} = $helper.bucketUtf8($c, $n);"
      case other => throw new IllegalStateException(s"unsupported $other")
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
