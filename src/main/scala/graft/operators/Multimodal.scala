package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side design is real and tested — schema, partition-friendly
  * operators, per-partition batch processing via `mapPartitions` on a
  * typed Dataset (the Scala analogue of arrow-batched UDFs: one fused
  * JVM pass per partition, no per-row closure dispatch, no driver
  * round-trips). The codec itself is STUBBED: this container has no
  * image/audio libraries, so `decodeStub` derives deterministic fake
  * "decoded" features from the payload bytes. A production build swaps
  * `decodeStub` for a real codec binding; nothing else changes.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      modality: String,       // image | audio | video
      payload: Array[Byte],
      width: Int,             // images/video: pixels; audio: sample rate
      height: Int,
      format: String)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      header_checksum: Long,
      features: Array[Float])

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  /** Deterministic synthetic media corpus derived from the `documents`
    * table (payload = md5 bytes of the text, repeated; modality by
    * doc_id mod 3) — a stand-in for a real binary ingest that keeps
    * every query reproducible and oracle-checkable. */
  def synthesizeFromDocs(docs: DataFrame): DataFrame = {
    // 8 × 16 md5 bytes = 128-byte binary payload (concat preserves
    // BinaryType; `repeat` would coerce to string)
    val payload = concat(Seq.fill(8)(unhex(md5(col("text")))): _*)
    graft.util.Par.spread(docs).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      payload.as("payload"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"),
      lit("synthetic").as("format"))
  }

  /** STUB decode + feature extraction, one partition at a time.
    * Real impl would bind an image/audio codec here; the fake derives
    * a per-16-byte-chunk mean as the "feature vector" and a header
    * checksum — deterministic functions of the payload so tests can
    * assert exact values. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val p = m.payload
        // ??? real codec goes here — everything below is the stub:
        var checksum = 0L
        var i = 0
        while (i < math.min(4, p.length)) {
          checksum = (checksum << 8) | (p(i) & 0xffL)
          i += 1
        }
        val nChunks = p.length / 16
        val feats = new Array[Float](nChunks)
        var c = 0
        while (c < nChunks) {
          var s = 0
          var j = 0
          while (j < 16) { s += p(c * 16 + j) & 0xff; j += 1 }
          feats(c) = s / 16.0f
          c += 1
        }
        MediaFeatures(m.media_id, m.modality, p.length, checksum, feats)
      }
    }
  }

  final case class Resized(
      media_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** STUB resize, per-partition batches: nearest-neighbor index mapping
    * over the payload treated as a width×height byte grid. The real
    * impl binds an image library in place of the index math; the
    * Spark-side shape — typed Dataset in, `mapPartitions` batch, typed
    * Dataset out, no shuffle, output co-partitioned with input — IS the
    * production plumbing and is what the spec pins. */
  def resize(spark: SparkSession, media: DataFrame,
      newW: Int, newH: Int): Dataset[Resized] = {
    import spark.implicits._
    require(newW > 0 && newH > 0, "target dimensions must be positive")
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val p = m.payload
        // ??? real codec resize goes here — below is the stub:
        val out = new Array[Byte](newW * newH)
        var y = 0
        while (y < newH) {
          val sy = (y.toLong * m.height / newH).toInt
          var x = 0
          while (x < newW) {
            val sx = (x.toLong * m.width / newW).toInt
            out(y * newW + x) = p((sy * m.width + sx) % p.length)
            x += 1
          }
          y += 1
        }
        Resized(m.media_id, newW, newH, out)
      }
    }
  }

  /** Frame extraction/sampling for video-like payloads: frame i = bytes
    * [i*frameBytes, (i+1)*frameBytes), keeping every `stride`-th frame —
    * pure Column ops (codegen'd); the explode keeps frames co-partitioned
    * with their media row (no shuffle). */
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
