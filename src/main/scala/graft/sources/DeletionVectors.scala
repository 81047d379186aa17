package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import scala.collection.mutable

/** Delta Lake deletion-vector codec, built from the PUBLIC protocol
  * specification (delta.io PROTOCOL.md §Deletion Vectors + the
  * RoaringFormatSpec it references).
  *
  * Layers, outermost first:
  *  - FILE storage: a `.bin` file whose first byte is the format
  *    version (1); each DV blob lives at a descriptor-given `offset` as
  *    [4-byte BIG-endian dataSize][data][4-byte BIG-endian CRC-32 of data].
  *  - DATA: [4-byte LITTLE-endian magic 1681511377][serialized
  *    RoaringBitmapArray]. Inline DVs ("i" storage) z85-encode exactly
  *    these data bytes into `pathOrInlineDv`.
  *  - RoaringBitmapArray "portable" serialization: [8-byte LE bitmap
  *    count][per bitmap: 4-byte LE key (high 32 bits of the 64-bit
  *    position) + standard 32-bit RoaringBitmap serialization].
  *  - Standard RoaringBitmap (RoaringFormatSpec): cookie 12346
  *    (no run containers, + 4-byte count) or 12347 (run containers,
  *    count-1 in the cookie's high 16 bits, then a run-flag bitset);
  *    descriptive header of [2-byte LE key, 2-byte LE cardinality-1]
  *    per container; an offset header when cookie=12346 or count ≥ 4;
  *    then containers: array (2-byte values), bitmap (8 KiB bitset) or
  *    run ([2-byte runCount][2-byte start, 2-byte length-1]*).
  *
  * The deserializer handles all three container types; the serializer
  * (fixture writer) emits array and bitmap containers (never runs),
  * which covers any position set.
  */
object DeletionVectors {
  val Magic: Int = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  // ------------------------------------------------------ z85 (RFC-free
  // ZeroMQ spec 32) — Delta encodes inline DVs and the UUIDs inside
  // `u`-storage pathOrInlineDv with it
  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 needs 4-byte alignment, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      (0 until 4).foreach(j => v = (v << 8) | (bytes(i + j) & 0xffL))
      val chunk = new Array[Char](5)
      (4 to 0 by -1).foreach { j => chunk(j) = z85Alphabet((v % 85).toInt); v /= 85 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  def z85DecodeBytes(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 input length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      (0 until 5).foreach { j =>
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
      }
      val o = i / 5 * 4
      (0 until 4).foreach(j => out(o + j) = ((v >>> (8 * (3 - j))) & 0xff).toByte)
      i += 5
    }
    out
  }

  // ------------------------------------------------- roaring (de)serialize

  /** Deserialize a RoaringBitmapArray (portable) into sorted 64-bit
    * positions. `data` must start at the 8-byte bitmap count (magic
    * already consumed). */
  def deserializePositions(data: ByteBuffer): Array[Long] = {
    data.order(ByteOrder.LITTLE_ENDIAN)
    val nBitmaps = data.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"bad bitmap count $nBitmaps")
    val out = mutable.ArrayBuilder.make[Long]
    (0L until nBitmaps).foreach { _ =>
      val key = data.getInt.toLong & 0xffffffffL // high 32 bits
      val high = key << 32
      readRoaring32(data).foreach(v => out += (high | (v & 0xffffffffL)))
    }
    out.result()
  }

  /** One standard-format 32-bit RoaringBitmap → its set values
    * (as unsigned ints in a Long-friendly range). */
  private def readRoaring32(b: ByteBuffer): Array[Long] = {
    val cookie = b.getInt
    val (nContainers, runFlags) =
      if ((cookie & 0xffff) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        b.get(flags)
        (n, flags)
      } else if (cookie == SerialCookieNoRun) {
        (b.getInt, null)
      } else throw new IllegalArgumentException(s"bad roaring cookie $cookie")
    def isRun(i: Int): Boolean =
      runFlags != null && ((runFlags(i / 8) & (1 << (i % 8))) != 0)
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    (0 until nContainers).foreach { i =>
      keys(i) = b.getShort & 0xffff
      cards(i) = (b.getShort & 0xffff) + 1
    }
    // offset header: always there without runs, only at ≥ threshold with
    if (runFlags == null || nContainers >= NoOffsetThreshold)
      (0 until nContainers).foreach(_ => b.getInt) // we read sequentially
    val out = mutable.ArrayBuilder.make[Long]
    (0 until nContainers).foreach { i =>
      val base = (keys(i).toLong & 0xffffL) << 16
      if (isRun(i)) {
        val nRuns = b.getShort & 0xffff
        (0 until nRuns).foreach { _ =>
          val start = b.getShort & 0xffff
          val len = b.getShort & 0xffff // run length - 1
          (start to start + len).foreach(v => out += (base | v))
        }
      } else if (cards(i) > 4096) { // bitmap container: 1024 words
        (0 until 1024).foreach { w =>
          val word = b.getLong
          if (word != 0L) (0 until 64).foreach { bit =>
            if ((word & (1L << bit)) != 0L) out += (base | (w * 64 + bit))
          }
        }
      } else (0 until cards(i)).foreach { _ =>
        out += (base | (b.getShort & 0xffff))
      }
    }
    out.result()
  }

  /** Serialize sorted distinct 64-bit positions as a RoaringBitmapArray
    * (portable): array containers up to 4096 values, bitmap containers
    * beyond — never run containers (legal per spec; runs are an
    * optional optimization). */
  def serializePositions(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "negative row position")
    val sorted = positions.distinct.sorted
    val byHigh = sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val buf = new java.io.ByteArrayOutputStream()
    val order = ByteOrder.LITTLE_ENDIAN
    def le(n: Int, v: Long): Unit = {
      val bb = ByteBuffer.allocate(n).order(order)
      if (n == 8) bb.putLong(v) else if (n == 4) bb.putInt(v.toInt)
      else bb.putShort(v.toShort)
      buf.write(bb.array())
    }
    le(8, byHigh.size.toLong)
    byHigh.foreach { case (high, vals) =>
      require(high <= 0xffffffffL, s"position ${vals.head} exceeds 2^64 range")
      le(4, high)
      val containers = vals.map(_ & 0xffffffffL).groupBy(_ >>> 16).toSeq.sortBy(_._1)
      le(4, SerialCookieNoRun.toLong) // cookie: no run containers
      le(4, containers.size.toLong)
      containers.foreach { case (k, vs) => le(2, k); le(2, (vs.size - 1).toLong) }
      // offset header (mandatory for the no-run cookie)
      var off = 4 + 4 + containers.size * 4 + containers.size * 4
      containers.foreach { case (_, vs) =>
        le(4, off.toLong)
        off += (if (vs.size > 4096) 8192 else vs.size * 2)
      }
      containers.foreach { case (_, vs) =>
        if (vs.size > 4096) {
          val words = new Array[Long](1024)
          vs.foreach { v => val lo = (v & 0xffffL).toInt; words(lo / 64) |= (1L << (lo % 64)) }
          val bb = ByteBuffer.allocate(8192).order(order)
          words.foreach(bb.putLong)
          buf.write(bb.array())
        } else vs.foreach(v => le(2, v & 0xffffL))
      }
    }
    buf.toByteArray
  }

  // ------------------------------------------------------- DV data blobs

  /** DV data bytes = LE magic + portable RoaringBitmapArray. */
  def dvDataBytes(positions: Seq[Long]): Array[Byte] = {
    val bm = serializePositions(positions)
    val bb = ByteBuffer.allocate(4 + bm.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic); bb.put(bm)
    bb.array()
  }

  /** Frame DV data bytes as the shared blob layout
    * [4B BE size][data][4B BE CRC-32(data)] — the framing BOTH Delta's
    * `.bin` storage and Iceberg v3's puffin `deletion-vector-v1` blobs
    * use (one definition; a framing fix cannot diverge between them). */
  def frameDvData(data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32(); crc.update(data)
    val bb = ByteBuffer.allocate(4 + data.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    bb.putInt(data.length)
    bb.put(data)
    bb.putInt((crc.getValue & 0xffffffffL).toInt)
    bb.array()
  }

  /** Decode DV data bytes (magic-checked) into positions. */
  def decodeDvData(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad deletion-vector magic $magic")
    deserializePositions(bb)
  }

  /** Decode one DV blob out of a `.bin` storage file's BYTES at
    * `offset`: [4B BE size][data][4B BE crc32(data)], with the file's
    * leading version byte checked once. Byte-based so the format layer
    * reads through its storage seam (TableIO). */
  def readDvBlob(bytes: Array[Byte], offset: Int, where: String): Array[Long] = {
    require(bytes.nonEmpty && bytes(0) == 1,
      s"unsupported deletion-vector file version ${if (bytes.isEmpty) "<empty>" else bytes(0)} in $where")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    bb.position(offset)
    val size = bb.getInt
    val data = new Array[Byte](size)
    bb.get(data)
    val expectCrc = bb.getInt.toLong & 0xffffffffL
    val crc = new CRC32(); crc.update(data)
    require(crc.getValue == expectCrc,
      s"deletion-vector checksum mismatch in $where at offset $offset")
    decodeDvData(data)
  }

  /** The single-DV storage file's BYTES plus the blob offset to record
    * in the descriptor (layout per spec: version byte, then the framed
    * blob) — byte-based so the format layer writes through TableIO. */
  def dvFileBytes(positions: Seq[Long]): (Array[Byte], Int) = {
    val frame = frameDvData(dvDataBytes(positions))
    ((1.toByte +: frame), 1) // version byte, then the framed blob
  }

  /** Canonical UUID string → the `u`-storage pathOrInlineDv suffix
    * (z85 of the 16 big-endian UUID bytes, 20 chars). */
  def encodeUuid(uuid: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  /** Inverse of [[encodeUuid]]: the last 20 chars of a `u`-storage
    * pathOrInlineDv (any leading chars are an optional path prefix). */
  def decodeUuid(s: String): (String, java.util.UUID) = {
    require(s.length >= 20, s"u-storage pathOrInlineDv too short: $s")
    val (prefix, enc) = s.splitAt(s.length - 20)
    val bytes = z85DecodeBytes(enc)
    val bb = ByteBuffer.wrap(bytes)
    (prefix, new java.util.UUID(bb.getLong, bb.getLong))
  }
}
