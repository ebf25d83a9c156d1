package graft

import java.nio.file.Files

import org.roaringbitmap.longlong.Roaring64NavigableMap
import org.scalatest.funsuite.AnyFunSuite

import graft.interop.Puffin

/** Codec-level contract for the puffin deletion-vector reader/writer —
  * the byte format is the public Iceberg spec's, so corruption and
  * malformed-trailer shapes must refuse loudly, never misparse. */
class PuffinSpec extends AnyFunSuite {

  private def bitmap(xs: Long*): Roaring64NavigableMap = {
    val bm = new Roaring64NavigableMap()
    xs.foreach(bm.addLong)
    bm
  }

  test("deletion vectors round-trip through a puffin file") {
    val dir = Files.createTempDirectory("puffin")
    val f = dir.resolve("dv.puffin")
    val blobs = Puffin.writeDeletionVectors(f, Seq(
      "/data/a.parquet" -> bitmap(0L, 5L, 1000000L, (1L << 33) + 7),
      "/data/b.parquet" -> bitmap(42L)), snapshotId = 9L, sequenceNumber = 3L)
    assert(blobs.size == 2)
    assert(blobs.map(_._4) == Seq(4L, 1L), "cardinalities")
    val footer = Puffin.readFooter(f)
    assert(footer.size == 2)
    assert(footer.forall(_.tpe == Puffin.DeletionVectorV1))
    assert(footer.map(_.properties("referenced-data-file")) ==
      Seq("/data/a.parquet", "/data/b.parquet"))
    footer.zip(blobs).foreach { case (b, (_, off, len, _)) =>
      assert(b.offset == off && b.length == len)
    }
    val a = Puffin.readDeletionVector(f, footer.head.offset, footer.head.length)
    assert(a.getLongCardinality == 4L && a.contains((1L << 33) + 7) &&
      a.contains(0L) && !a.contains(1L))
    val b = Puffin.readDeletionVector(f, footer(1).offset, footer(1).length)
    assert(b.getLongCardinality == 1L && b.contains(42L))
  }

  test("corrupt blob (CRC) and non-puffin trailers refuse loudly") {
    val dir = Files.createTempDirectory("puffin-bad")
    val f = dir.resolve("dv.puffin")
    val blobs = Puffin.writeDeletionVectors(f,
      Seq("/data/a.parquet" -> bitmap(1L, 2L, 3L)), 1L, 1L)
    // flip one byte inside the vector: CRC must catch it
    val bytes = Files.readAllBytes(f)
    val mid = (blobs.head._2 + 10).toInt
    bytes(mid) = (bytes(mid) ^ 0x5a).toByte
    val corrupt = dir.resolve("corrupt.puffin")
    Files.write(corrupt, bytes)
    val footer = Puffin.readFooter(corrupt) // footer itself untouched
    val e = intercept[IllegalArgumentException](
      Puffin.readDeletionVector(corrupt, footer.head.offset, footer.head.length))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("magic"),
      e.getMessage)
    // a random file is not puffin
    val junk = dir.resolve("junk.bin")
    Files.write(junk, Array.fill[Byte](64)(7))
    val e2 = intercept[IllegalArgumentException](Puffin.readFooter(junk))
    assert(e2.getMessage.contains("magic"), e2.getMessage)
    // a compressed-footer flag refuses (this reader never misparses)
    val flagged = Files.readAllBytes(f)
    flagged(flagged.length - 8) = 1
    val comp = dir.resolve("compressed.puffin")
    Files.write(comp, flagged)
    val e3 = intercept[IllegalArgumentException](Puffin.readFooter(comp))
    assert(e3.getMessage.contains("compressed"), e3.getMessage)
  }
}
