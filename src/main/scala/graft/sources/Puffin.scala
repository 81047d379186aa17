package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

/** Iceberg Puffin file codec — the sidecar format Iceberg v3 stores
  * deletion vectors in. Built from the PUBLIC specs only: the Puffin
  * spec (iceberg.apache.org/puffin-spec) and the Iceberg table spec v3
  * §Deletion Vectors.
  *
  * File layout: `magic, blob*, footer` where footer =
  * `magic, payload(UTF-8 JSON), payloadSize(4B LE), flags(4B), magic`
  * and magic = "PFA1". The payload lists each blob's type, offset,
  * length, snapshot/sequence, and properties. Flags are all zero here
  * (no footer compression).
  *
  * `deletion-vector-v1` blob layout (table spec v3):
  * `[4B BE length of (magic+vector)] [magic D1 D3 39 64]
  *  [vector: portable 64-bit RoaringBitmapArray] [4B BE CRC-32 of
  *  (magic+vector)]` — BYTE-IDENTICAL to a Delta deletion-vector blob
  * (delta.io PROTOCOL.md §Deletion Vector Format; the v3 spec adopted
  * Delta's framing so UniForm-style tables can share the same bytes).
  * This codec therefore reuses [[DeletionVectors]] for the inner data
  * (magic + bitmap) and only adds the Puffin wrapping: a Delta DV and
  * an Iceberg v3 DV of the same positions differ ONLY in container
  * file (`.bin` version byte + frame vs puffin magic/footer + frame),
  * which is what makes CONVERT carry merge-on-read state verbatim.
  */
object Puffin {

  val Magic: Array[Byte] = "PFA1".getBytes(StandardCharsets.UTF_8)
  val DvBlobType = "deletion-vector-v1"
  /** Puffin spec blob type: a serialized Apache DataSketches compact
    * theta sketch of a column's values — the NDV statistic Iceberg's
    * `statistics` metadata carries and engines (Trino, Spark's iceberg
    * runtime) read for cardinality-based planning. */
  val ThetaBlobType = "apache-datasketches-theta-v1"

  /** One statistics blob headed for a puffin statistics file. */
  final case class StatsBlob(blobType: String, fields: Seq[Int],
                             snapshotId: Long, sequenceNumber: Long,
                             bytes: Array[Byte],
                             properties: Map[String, String])

  /** Where one DV blob landed inside a puffin file: the manifest entry
    * fields (content_offset / content_size_in_bytes) point straight at
    * it, so readers never need the footer on the scan path. */
  final case class DvBlobLoc(referencedDataFile: String, offset: Long,
                             length: Long, cardinality: Long)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One framed deletion-vector blob: length-prefixed magic+bitmap with
    * a trailing CRC-32 — `DeletionVectors.dvDataBytes` IS the
    * magic+bitmap (the shared Delta framing, see object scaladoc). */
  def dvBlobBytes(positions: Seq[Long]): Array[Byte] =
    DeletionVectors.frameDvData(DeletionVectors.dvDataBytes(positions))

  /** A whole puffin file holding one DV blob per referenced data file.
    * Returns the file bytes plus each blob's location for the manifest
    * entries. `snapshotId`/`sequenceNumber` land in the footer blob
    * metadata (the spec records the write's snapshot there). */
  def dvFileBytes(dvs: Seq[(String, Seq[Long])], snapshotId: Long,
                  sequenceNumber: Long): (Array[Byte], Seq[DvBlobLoc]) =
    dvFileBytesFramed(dvs.map { case (raw, ps) =>
      (raw, dvBlobBytes(ps), ps.distinct.length.toLong) },
      snapshotId, sequenceNumber)

  /** Same, from PRE-FRAMED blobs — how CONVERT carries a Delta
    * deletion vector into v3 verbatim: the Delta frame
    * ([len][magic+bitmap][crc]) IS a puffin DV blob, so the bytes pass
    * through untouched. */
  def dvFileBytesFramed(dvs: Seq[(String, Array[Byte], Long)],
                        snapshotId: Long, sequenceNumber: Long)
  : (Array[Byte], Seq[DvBlobLoc]) = {
    require(dvs.nonEmpty, "puffin DV file needs at least one vector")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val locs = dvs.map { case (raw, blob, cardinality) =>
      val offset = out.size().toLong
      out.write(blob)
      DvBlobLoc(raw, offset, blob.length.toLong, cardinality)
    }
    // footer: magic, JSON payload, payload size (LE), zero flags, magic
    out.write(Magic)
    val payload = mapper.createObjectNode()
    val blobsNode = payload.putArray("blobs")
    locs.foreach { l =>
      val b = blobsNode.addObject()
      b.put("type", DvBlobType)
      b.putArray("fields") // DVs are not per-column sketches
      b.put("snapshot-id", snapshotId)
      b.put("sequence-number", sequenceNumber)
      b.put("offset", l.offset)
      b.put("length", l.length)
      val props = b.putObject("properties")
      props.put("referenced-data-file", l.referencedDataFile)
      props.put("cardinality", l.cardinality.toString)
    }
    val payloadBytes =
      mapper.writeValueAsString(payload).getBytes(StandardCharsets.UTF_8)
    out.write(payloadBytes)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payloadBytes.length)
    tail.putInt(0) // flags: footer payload uncompressed
    out.write(tail.array())
    out.write(Magic)
    (out.toByteArray, locs)
  }

  /** A whole puffin STATISTICS file (spec: same container as DV
    * sidecars, blob bytes raw at (offset, length), typed in the
    * footer). Returns the file bytes, the footer size (Iceberg's
    * statistics metadata records `file-footer-size-in-bytes`), and
    * each blob's (offset, length) in input order. */
  def statsFileBytes(blobs: Seq[StatsBlob])
  : (Array[Byte], Long, Seq[(Long, Long)]) = {
    require(blobs.nonEmpty, "puffin statistics file needs >=1 blob")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val locs = blobs.map { b =>
      val offset = out.size().toLong
      out.write(b.bytes)
      (offset, b.bytes.length.toLong)
    }
    val footerStart = out.size()
    out.write(Magic)
    val payload = mapper.createObjectNode()
    val blobsNode = payload.putArray("blobs")
    blobs.zip(locs).foreach { case (b, (off, len)) =>
      val n = blobsNode.addObject()
      n.put("type", b.blobType)
      val fs = n.putArray("fields")
      b.fields.foreach(fs.add)
      n.put("snapshot-id", b.snapshotId)
      n.put("sequence-number", b.sequenceNumber)
      n.put("offset", off)
      n.put("length", len)
      if (b.properties.nonEmpty) {
        val props = n.putObject("properties")
        b.properties.foreach { case (k, v) => props.put(k, v) }
      }
    }
    val payloadBytes =
      mapper.writeValueAsString(payload).getBytes(StandardCharsets.UTF_8)
    out.write(payloadBytes)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payloadBytes.length)
    tail.putInt(0)
    out.write(tail.array())
    out.write(Magic)
    val bytes = out.toByteArray
    (bytes, (bytes.length - footerStart).toLong, locs)
  }

  /** Decode one DV blob at (offset, length) — the manifest-entry
    * coordinates — into sorted positions. Validates the frame: length
    * prefix consistent with the entry's, magic, CRC. */
  def readDvBlob(bytes: Array[Byte], offset: Long, length: Long,
                 where: String): Array[Long] = {
    require(offset >= 0 && offset + length <= bytes.length,
      s"DV blob [$offset, +$length] out of range of $where (${bytes.length} bytes)")
    val bb = ByteBuffer.wrap(bytes, offset.toInt, length.toInt)
      .order(ByteOrder.BIG_ENDIAN)
    val dataLen = bb.getInt
    require(dataLen.toLong == length - 8,
      s"DV blob length prefix $dataLen != framed ${length - 8} in $where")
    val data = new Array[Byte](dataLen)
    bb.get(data)
    val expectCrc = bb.getInt.toLong & 0xffffffffL
    val crc = new CRC32(); crc.update(data)
    require(crc.getValue == expectCrc,
      s"DV blob checksum mismatch at offset $offset of $where")
    DeletionVectors.decodeDvData(data) // magic-checked inside
  }

  /** Footer blob metadata WITH field ids: (type, fields, offset,
    * length, properties) — the statistics-file read surface (a theta
    * blob's `fields` names the column it sketches). */
  def statsBlobs(bytes: Array[Byte])
  : Seq[(String, Seq[Int], Long, Long, Map[String, String])] = {
    val node = footerPayload(bytes)
    val arr = node.get("blobs")
    (0 until arr.size()).map(arr.get).map { b =>
      val fields = Option(b.get("fields")).map(f =>
        (0 until f.size()).map(f.get(_).asInt()).toSeq).getOrElse(Seq.empty)
      (b.get("type").asText(), fields, b.get("offset").asLong(),
        b.get("length").asLong(), propsOf(b))
    }
  }

  private def propsOf(b: com.fasterxml.jackson.databind.JsonNode)
  : Map[String, String] =
    Option(b.get("properties")).map { p =>
      val bld = Map.newBuilder[String, String]
      val it = p.fields()
      while (it.hasNext) {
        val e = it.next(); bld += e.getKey -> e.getValue.asText() }
      bld.result()
    }.getOrElse(Map.empty[String, String])

  private def footerPayload(bytes: Array[Byte])
  : com.fasterxml.jackson.databind.JsonNode = {
    def magicAt(off: Int): Boolean =
      off >= 0 && off + 4 <= bytes.length &&
        java.util.Arrays.equals(bytes.slice(off, off + 4), Magic)
    require(magicAt(0), "not a puffin file (no leading magic)")
    require(magicAt(bytes.length - 4), "not a puffin file (no trailing magic)")
    val tail = ByteBuffer.wrap(bytes, bytes.length - 12, 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    val payloadSize = tail.getInt
    val flags = tail.getInt
    require((flags & 1) == 0, "compressed puffin footer payload — unsupported")
    val payloadStart = bytes.length - 12 - payloadSize
    require(magicAt(payloadStart - 4), "puffin footer start magic missing")
    mapper.readTree(new String(bytes, payloadStart, payloadSize,
      StandardCharsets.UTF_8))
  }

  /** Footer blob metadata: (type, offset, length, properties) per blob.
    * The scan path resolves blobs through manifest entries instead;
    * this is the interop/validation surface (what an external reader
    * that only has the puffin file would use). */
  def blobs(bytes: Array[Byte])
  : Seq[(String, Long, Long, Map[String, String])] = {
    val arr = footerPayload(bytes).get("blobs")
    (0 until arr.size()).map(arr.get).map { b =>
      (b.get("type").asText(), b.get("offset").asLong(),
        b.get("length").asLong(), propsOf(b))
    }
  }
}
