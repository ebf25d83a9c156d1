package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The payloads are REAL self-describing media formats, parsed by a
  * real dependency-free codec in this file:
  *
  *  - image → BMP (14-byte BITMAPFILEHEADER + 40-byte
  *    BITMAPINFOHEADER + 24-bit BGR rows, 4-byte row alignment) — the
  *    Windows bitmap layout, public since 1990,
  *  - audio → WAV (RIFF header + `fmt ` chunk + PCM16 mono `data`
  *    chunk) — the RIFF/WAVE layout,
  *  - video → a sequence of concatenated BMP frames, walked via each
  *    frame's declared-in-header file size (real container
  *    introspection, not fixed-offset math).
  *
  * Scale design: synthesis, decode, feature extraction and resize are
  * all `mapPartitions` over a typed Dataset — one fused JVM pass per
  * partition, no shuffle, output co-partitioned with input (the Scala
  * analogue of arrow-batched decode UDFs). A production build would
  * swap the byte-level codec for a JNI/library binding; the operator
  * shapes, schemas and partitioning stay identical.
  */
object Multimodal {

  /** One media row: payload + typed metadata mirroring the header. */
  final case class MediaRow(
      media_id: Long,
      modality: String,       // image | audio | video
      payload: Array[Byte],
      width: Int,             // image/video: pixels; audio: sample rate
      height: Int,            // image/video: pixels; audio: sample count
      format: String)         // bmp | wav | bmpseq

  /** Parsed-from-payload features. `dim1`/`dim2` come from the HEADER
    * (width/height for bitmaps, sample-rate/sample-count for WAV),
    * `n_units` from walking the container (1 image, N samples, N
    * frames), `head_byte` is the first decoded payload byte, and
    * `features` a small real feature vector (per-row / per-block /
    * per-frame means). */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      dim1: Int,
      dim2: Int,
      n_units: Int,
      head_byte: Int,
      features: Array[Float])

  // ---- byte-level codec ---------------------------------------------------

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** BMP row stride: 24-bit rows pad to a 4-byte boundary. */
  private def bmpStride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  private val BmpHeaderBytes = 54
  private val WavHeaderBytes = 44

  /** Encode a 24-bit bottom-up BMP; `pixel(i)` supplies pixel byte `i`
    * counting PIXEL bytes only (row padding is zero-filled and not
    * part of the pixel index — keeps derived expectations
    * padding-independent). */
  def encodeBmp(w: Int, h: Int, pixel: Int => Byte): Array[Byte] = {
    val stride = bmpStride(w)
    val size = BmpHeaderBytes + stride * h
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    le32(b, 2, size)                  // declared file size
    le32(b, 10, BmpHeaderBytes)       // pixel data offset
    le32(b, 14, 40)                   // BITMAPINFOHEADER size
    le32(b, 18, w)
    le32(b, 22, h)
    le16(b, 26, 1)                    // planes
    le16(b, 28, 24)                   // bits per pixel
    le32(b, 34, stride * h)           // image size
    le32(b, 38, 2835); le32(b, 42, 2835) // 72 dpi
    var y = 0
    var g = 0
    while (y < h) {
      var i = 0
      while (i < w * 3) {
        b(BmpHeaderBytes + y * stride + i) = pixel(g)
        g += 1; i += 1
      }
      y += 1
    }
    b
  }

  /** Parsed BMP: header dims + pixel bytes (padding stripped). */
  final case class Bmp(fileSize: Int, width: Int, height: Int,
      bitsPerPixel: Int, pixels: Array[Byte])

  /** Decode one BMP starting at `off`; validates magic and 24-bit
    * format. Real header parse — every field read from the bytes. */
  def decodeBmp(p: Array[Byte], off: Int = 0): Bmp = {
    require(p.length - off >= BmpHeaderBytes, s"truncated BMP at offset $off")
    require(p(off) == 'B' && p(off + 1) == 'M', s"bad BMP magic at offset $off")
    val fileSize = readLe32(p, off + 2)
    val dataOff = readLe32(p, off + 10)
    val w = readLe32(p, off + 18)
    val h = readLe32(p, off + 22)
    val bpp = readLe16(p, off + 28)
    require(bpp == 24, s"unsupported BMP bpp $bpp")
    val stride = bmpStride(w)
    val pixels = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      System.arraycopy(p, off + dataOff + y * stride, pixels, y * w * 3, w * 3)
      y += 1
    }
    Bmp(fileSize, w, h, bpp, pixels)
  }

  /** Encode PCM16 mono WAV; `sampleByte(i)` supplies data byte `i`. */
  def encodeWav(sampleRate: Int, nSamples: Int, sampleByte: Int => Byte): Array[Byte] = {
    val dataBytes = nSamples * 2
    val b = new Array[Byte](WavHeaderBytes + dataBytes)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    le32(b, 4, 36 + dataBytes)        // RIFF chunk size
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    le32(b, 16, 16)                   // fmt chunk size
    le16(b, 20, 1)                    // PCM
    le16(b, 22, 1)                    // mono
    le32(b, 24, sampleRate)
    le32(b, 28, sampleRate * 2)       // byte rate
    le16(b, 32, 2)                    // block align
    le16(b, 34, 16)                   // bits per sample
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    le32(b, 40, dataBytes)
    var i = 0
    while (i < dataBytes) { b(WavHeaderBytes + i) = sampleByte(i); i += 1 }
    b
  }

  final case class Wav(sampleRate: Int, bitsPerSample: Int, channels: Int,
      nSamples: Int, data: Array[Byte])

  def decodeWav(p: Array[Byte]): Wav = {
    require(p.length >= WavHeaderBytes, "truncated WAV")
    require(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E', "bad RIFF/WAVE magic")
    val channels = readLe16(p, 22)
    val rate = readLe32(p, 24)
    val bits = readLe16(p, 34)
    val dataBytes = readLe32(p, 40)
    require(bits == 16 && channels == 1, s"unsupported WAV layout ($bits bit, $channels ch)")
    val data = java.util.Arrays.copyOfRange(p, WavHeaderBytes, WavHeaderBytes + dataBytes)
    Wav(rate, bits, channels, dataBytes / 2, data)
  }

  /** Walk a concatenated-BMP container via each frame's declared file
    * size. Returns the frame start offsets. */
  def bmpFrameOffsets(p: Array[Byte]): Seq[Int] = {
    val offs = Seq.newBuilder[Int]
    var off = 0
    while (off < p.length) {
      require(p(off) == 'B' && p(off + 1) == 'M', s"bad frame magic at offset $off")
      offs += off
      off += readLe32(p, off + 2)
    }
    offs.result()
  }

  // ---- synthesis ----------------------------------------------------------

  /** Internal synthesis input row (doc id + md5 hex). Not private: the
    * Dataset encoder's generated projection needs constructor access,
    * and a private case class forces interpreted-mode fallback. */
  final case class SynthIn(doc_id: Long, hhex: String)

  /** Deterministic media corpus derived from the `documents` table:
    * pixel/sample bytes cycle the md5 of the text, and every dimension
    * is a small arithmetic function of doc_id — so DuckDB oracles can
    * recompute byte-exact expectations while the payloads are REAL
    * parseable BMP/WAV/BMP-sequence binaries.
    *
    * image (doc_id%3==0): BMP, w=((doc_id%4)+1)*4, h=(doc_id%5)+1
    * audio (doc_id%3==1): WAV, rate=8000+1000*(doc_id%4),
    *                      nSamples=16+(doc_id%5)*8
    * video (doc_id%3==2): 2+(doc_id%4) BMP frames of 4×3, pixel bytes
    *                      continue cycling ACROSS frames (frame f byte
    *                      i = md5[(f*36+i) % 16]) */
  def synthesizeFromDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.util.Par.spread(docs)
      .select(col("doc_id"), md5(col("text")).as("hhex")).as[SynthIn]
      .mapPartitions { rows =>
        rows.map { r =>
          val hb = new Array[Byte](16)
          var i = 0
          while (i < 16) {
            hb(i) = Integer.parseInt(r.hhex.substring(2 * i, 2 * i + 2), 16).toByte
            i += 1
          }
          val id = r.doc_id
          val m4 = (id % 4).toInt
          val m5 = (id % 5).toInt
          (id % 3).toInt match {
            case 0 =>
              val w = (m4 + 1) * 4
              val h = m5 + 1
              MediaRow(id, "image", encodeBmp(w, h, g => hb(g % 16)), w, h, "bmp")
            case 1 =>
              val rate = 8000 + 1000 * m4
              val n = 16 + m5 * 8
              MediaRow(id, "audio", encodeWav(rate, n, j => hb(j % 16)), rate, n, "wav")
            case _ =>
              val nFrames = 2 + m4
              val frames = (0 until nFrames).map { f =>
                encodeBmp(4, 3, g => hb((f * 36 + g) % 16))
              }
              val payload = new Array[Byte](frames.map(_.length).sum)
              var off = 0
              frames.foreach { fb =>
                System.arraycopy(fb, 0, payload, off, fb.length); off += fb.length
              }
              MediaRow(id, "video", payload, 4, 3, "bmpseq")
          }
        }
      }.toDF()
  }

  // ---- decode + feature extraction ---------------------------------------

  /** REAL decode + feature extraction, one partition at a time: parse
    * the header of whichever format the payload magic declares, walk
    * the container, and derive a small feature vector from the decoded
    * units (per-row pixel means / per-8-sample block means / per-frame
    * means). Metadata columns are deliberately ignored — everything
    * comes from the bytes. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val p = m.payload
        if (p.length >= 4 && p(0) == 'R' && p(1) == 'I') {
          val w = decodeWav(p)
          val nBlocks = w.nSamples / 8
          val feats = new Array[Float](nBlocks)
          var c = 0
          while (c < nBlocks) {
            var s = 0
            var j = 0
            while (j < 16) { s += w.data(c * 16 + j) & 0xff; j += 1 }
            feats(c) = s / 16.0f
            c += 1
          }
          MediaFeatures(m.media_id, m.modality, p.length, w.sampleRate,
            w.nSamples, w.nSamples, w.data(0) & 0xff, feats)
        } else {
          val first = decodeBmp(p)
          if (first.fileSize >= p.length) {
            // single image
            val feats = new Array[Float](first.height)
            var y = 0
            while (y < first.height) {
              var s = 0
              var i = 0
              while (i < first.width * 3) { s += first.pixels(y * first.width * 3 + i) & 0xff; i += 1 }
              feats(y) = s.toFloat / (first.width * 3)
              y += 1
            }
            MediaFeatures(m.media_id, m.modality, p.length, first.width,
              first.height, 1, first.pixels(0) & 0xff, feats)
          } else {
            // concatenated frames: walk declared sizes
            val offs = bmpFrameOffsets(p)
            val frames = offs.map(decodeBmp(p, _))
            val feats = frames.map { f =>
              var s = 0
              var i = 0
              while (i < f.pixels.length) { s += f.pixels(i) & 0xff; i += 1 }
              s.toFloat / f.pixels.length
            }.toArray
            MediaFeatures(m.media_id, m.modality, p.length, first.width,
              first.height, frames.size, first.pixels(0) & 0xff, feats)
          }
        }
      }
    }
  }

  final case class Resized(
      media_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** REAL nearest-neighbor resize of BMP images: decode the pixel grid
    * from the header, remap each (x,y) per channel, re-encode a valid
    * BMP. Per-partition batches, no shuffle, output co-partitioned
    * with input — the production plumbing for a batch image transform. */
  def resize(spark: SparkSession, media: DataFrame,
      newW: Int, newH: Int): Dataset[Resized] = {
    import spark.implicits._
    require(newW > 0 && newH > 0, "target dimensions must be positive")
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val src = decodeBmp(m.payload)
        val out = encodeBmp(newW, newH, { g =>
          val c = g % 3
          val x = (g / 3) % newW
          val y = g / (3 * newW)
          val sx = (x.toLong * src.width / newW).toInt
          val sy = (y.toLong * src.height / newH).toInt
          src.pixels((sy * src.width + sx) * 3 + c)
        })
        Resized(m.media_id, newW, newH, out)
      }
    }
  }

  /** Fixed-size frame sampling: frame i = bytes [i*frameBytes,
    * (i+1)*frameBytes), keeping every `stride`-th frame — pure Column
    * ops (codegen'd); the explode keeps frames co-partitioned with
    * their media row (no shuffle). The scale path for fixed-frame
    * containers (this fixture's video frames are 90 bytes each);
    * [[bmpFrameOffsets]] is the header-walking variant for
    * variable-size frames. */
  def frames(media: DataFrame, frameBytes: Int, stride: Int = 1): DataFrame =
    media
      .withColumn("n_frames", (length(col("payload")) / frameBytes).cast("int"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("modality"),
        posexplode_outer(transform(
          filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0),
          i => col("payload").substr((i * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame_bytes")))
}
