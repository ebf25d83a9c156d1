package graft.interop

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Iceberg PUFFIN file format (public spec), scoped to what v3
  * deletion vectors need — the v3 MOR interop tier rides on it in both
  * directions ([[IcebergExport]] emits DVs for outstanding position
  * vectors; [[IcebergImport]] decodes foreign DVs back into graft
  * vectors).
  *
  * File layout per the spec:
  * {{{
  * Magic "PFA1" | Blob1 … BlobN | Magic "PFA1" | FooterPayload (JSON)
  *   | FooterPayloadSize (int32 LE) | Flags (4 bytes) | Magic "PFA1"
  * }}}
  * FooterPayload is the FileMetadata JSON: `{"blobs": [{"type": …,
  * "fields": […], "snapshot-id": N, "sequence-number": N, "offset": N,
  * "length": N, "properties": {…}}, …], "properties": {…}}`. This
  * writer always emits the payload UNCOMPRESSED (flags = 0); the
  * reader refuses compressed footers loudly (bit 0 of flag byte 0)
  * rather than misparse.
  *
  * `deletion-vector-v1` blob layout per the Iceberg v3 spec:
  * {{{
  * combined length of vector+magic (4 bytes BIG-endian)
  * magic D1 D3 39 64 | 64-bit roaring bitmap, "portable" serialization
  * CRC-32 of magic+vector (4 bytes BIG-endian)
  * }}}
  * The bitmap is the Java library's `Roaring64NavigableMap` portable
  * format — the exact serialization the spec names (little-endian
  * count of 32-bit buckets, each a 4-byte high key + standard 32-bit
  * roaring bitmap). Blob properties carry `referenced-data-file` and
  * `cardinality`, mirrored into the v3 manifest entry's
  * `referenced_data_file`/`content_offset`/`content_size_in_bytes`
  * fields (ids 143/144/145). One blob references exactly ONE data
  * file — a DV is that file's row-position bitmap. */
object Puffin {

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"
  private val DvMagic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)
  val DeletionVectorV1 = "deletion-vector-v1"

  /** `apache-datasketches-theta-v1` — the spec's NDV statistics blob:
    * a serialized COMPACT theta sketch built over values in Iceberg
    * single-value binary form, `ndv` carried as a blob property so
    * readers that only want the estimate never deserialize the
    * sketch (the Trino/Iceberg convention). */
  val ThetaV1 = "apache-datasketches-theta-v1"

  final case class Blob(
      tpe: String,
      offset: Long,
      length: Long,
      properties: Map[String, String],
      fields: Seq[Int] = Seq.empty,
      snapshotId: Option[Long] = None,
      sequenceNumber: Option[Long] = None)

  /** Parse the footer's blob index. Refuses compressed footer payloads
    * and trailers that are not puffin (wrong magic). */
  def readFooter(path: Path): Seq[Blob] = {
    implicit val fmts: Formats = DefaultFormats
    val bytes = Files.readAllBytes(path)
    require(bytes.length >= 16 && bytes.take(4).sameElements(Magic) &&
      bytes.takeRight(4).sameElements(Magic),
      s"$path: not a puffin file (magic mismatch)")
    val flags = bytes(bytes.length - 8)
    require((flags & 1) == 0,
      s"$path: puffin footer payload is compressed — this reader only " +
        "parses uncompressed footers; refuse rather than misparse")
    val size = java.nio.ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    require(size > 0 && size <= bytes.length - 16,
      s"$path: malformed puffin footer payload size $size")
    val payload = new String(bytes, bytes.length - 12 - size, size,
      StandardCharsets.UTF_8)
    val json = JsonMethods.parse(payload)
    (json \ "blobs").asInstanceOf[JArray].arr.map { b =>
      Blob((b \ "type").extract[String],
        (b \ "offset").extract[Long],
        (b \ "length").extract[Long],
        (b \ "properties") match {
          case JObject(fs) => fs.collect {
            case (k, JString(v)) => k -> v
            case (k, JInt(v)) => k -> v.toString
            case (k, JLong(v)) => k -> v.toString
          }.toMap
          case _ => Map.empty[String, String]
        },
        fields = (b \ "fields") match {
          case JArray(xs) => xs.collect {
            case JInt(v) => v.toInt
            case JLong(v) => v.toInt
          }
          case _ => Seq.empty
        },
        snapshotId = (b \ "snapshot-id").extractOpt[Long],
        sequenceNumber = (b \ "sequence-number").extractOpt[Long])
    }
  }

  /** Total byte length of the puffin FOOTER (trailing magic + payload +
    * payload-size + flags + magic) — the `file-footer-size-in-bytes` an
    * Iceberg statistics-file entry declares so readers seek the blob
    * index without probing. */
  def footerSize(path: Path): Long = {
    val bytes = Files.readAllBytes(path)
    require(bytes.length >= 16 && bytes.takeRight(4).sameElements(Magic),
      s"$path: not a puffin file (magic mismatch)")
    val size = java.nio.ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    4L + size + 12L
  }

  /** Raw bytes of one blob at (offset, length) — statistics blobs
    * (theta sketches) are unframed, unlike DV blobs. */
  def readBlobBytes(path: Path, offset: Long, length: Long): Array[Byte] = {
    val ch = Files.newByteChannel(path)
    try {
      ch.position(offset)
      val b = java.nio.ByteBuffer.allocate(length.toInt)
      var read = 0
      while (read < length && ch.read(b) >= 0) read = b.position()
      require(read == length, s"$path: truncated puffin blob at $offset")
      b.array()
    } finally ch.close()
  }

  /** Write one puffin file of `apache-datasketches-theta-v1` blobs —
    * one per analyzed column, `fields` carrying the column's Iceberg
    * field id and `ndv` the sketch's estimate as a property. The blob
    * body is the compact sketch's own serialization, UNFRAMED (the
    * spec frames only deletion vectors). */
  def writeStats(path: Path,
      blobs: Seq[(Int, Array[Byte], Long)], // (fieldId, sketchBytes, ndv)
      snapshotId: Long, sequenceNumber: Long): Unit = {
    require(blobs.nonEmpty, "a puffin file needs at least one blob")
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val blobMeta = blobs.map { case (fieldId, bytes, ndv) =>
      val offset = out.size().toLong
      out.write(bytes)
      (fieldId, offset, bytes.length.toLong, ndv)
    }
    val payload = JsonMethods.compact(JsonMethods.render(
      ("blobs" -> blobMeta.map { case (fieldId, offset, length, ndv) =>
        ("type" -> ThetaV1) ~
          ("fields" -> List(fieldId)) ~
          ("snapshot-id" -> snapshotId) ~
          ("sequence-number" -> sequenceNumber) ~
          ("offset" -> offset) ~ ("length" -> length) ~
          ("properties" -> (("ndv" -> ndv.toString): JValue)): JValue
      }.toList) ~
        ("properties" -> (("created-by" -> "graft"): JValue))))
      .getBytes(StandardCharsets.UTF_8)
    out.write(Magic)
    out.write(payload)
    out.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(payload.length).array())
    out.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed footer
    out.write(Magic)
    Files.write(path, out.toByteArray)
    ()
  }

  /** Decode one `deletion-vector-v1` blob at (offset, length) into its
    * position bitmap, CRC-verified. */
  def readDeletionVector(path: Path, offset: Long, length: Long): Roaring64NavigableMap = {
    val ch = Files.newByteChannel(path)
    val buf = try {
      ch.position(offset)
      val b = java.nio.ByteBuffer.allocate(length.toInt)
      var read = 0
      while (read < length && ch.read(b) >= 0) read = b.position()
      require(read == length, s"$path: truncated puffin blob at $offset")
      b.flip(); b
    } finally ch.close()
    val declared = buf.order(java.nio.ByteOrder.BIG_ENDIAN).getInt
    require(declared == length - 8,
      s"$path: deletion-vector blob length prefix $declared does not match " +
        s"blob size ${length - 8}")
    val magic = new Array[Byte](4); buf.get(magic)
    require(magic.sameElements(DvMagic),
      s"$path: deletion-vector blob magic mismatch")
    val vector = new Array[Byte](declared - 4); buf.get(vector)
    val storedCrc = buf.getInt
    val crc = new java.util.zip.CRC32()
    crc.update(DvMagic); crc.update(vector)
    require(crc.getValue.toInt == storedCrc,
      s"$path: deletion-vector CRC mismatch — corrupt blob")
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(new DataInputStream(
      new java.io.ByteArrayInputStream(vector)))
    bm
  }

  /** Write one puffin file holding a `deletion-vector-v1` blob per
    * referenced data file. Returns, per input, (referencedDataFile,
    * blobOffset, blobLength, cardinality) for the caller's manifest
    * entries. */
  def writeDeletionVectors(path: Path,
      dvs: Seq[(String, Roaring64NavigableMap)],
      snapshotId: Long, sequenceNumber: Long): Seq[(String, Long, Long, Long)] = {
    require(dvs.nonEmpty, "a puffin file needs at least one blob")
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val blobMeta = dvs.map { case (refFile, bm) =>
      bm.runOptimize()
      val vecBytes = {
        val b = new ByteArrayOutputStream()
        bm.serializePortable(new DataOutputStream(b))
        b.toByteArray
      }
      val crc = new java.util.zip.CRC32()
      crc.update(DvMagic); crc.update(vecBytes)
      val offset = out.size().toLong
      val blob = java.nio.ByteBuffer.allocate(4 + 4 + vecBytes.length + 4)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
        .putInt(4 + vecBytes.length).put(DvMagic).put(vecBytes)
        .putInt(crc.getValue.toInt).array()
      out.write(blob)
      val cardinality = bm.getLongCardinality
      (refFile, offset, blob.length.toLong, cardinality)
    }
    val payload = JsonMethods.compact(JsonMethods.render(
      ("blobs" -> blobMeta.map { case (refFile, offset, length, card) =>
        ("type" -> DeletionVectorV1) ~
          ("fields" -> List.empty[Int]) ~
          ("snapshot-id" -> snapshotId) ~
          ("sequence-number" -> sequenceNumber) ~
          ("offset" -> offset) ~ ("length" -> length) ~
          ("properties" -> (("referenced-data-file" -> refFile) ~
            ("cardinality" -> card.toString))): JValue
      }.toList) ~
        ("properties" -> (("created-by" -> "graft"): JValue))))
      .getBytes(StandardCharsets.UTF_8)
    out.write(Magic)
    out.write(payload)
    out.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(payload.length).array())
    out.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed footer
    out.write(Magic)
    Files.write(path, out.toByteArray)
    blobMeta
  }
}
