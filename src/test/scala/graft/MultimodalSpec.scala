package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media =
    Multimodal.synthesizeFromDocs(spark.read.parquet(s"$sf/documents.parquet"))

  test("synthesized payloads are 128-byte binaries with typed metadata") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").length == 128)
      assert(Set("image", "audio", "video").contains(r.getAs[String]("modality")))
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("height") >= 1)
    }
  }

  test("stub decode: checksum equals first 4 payload bytes, 8 chunk features") {
    val feats = Multimodal.extractFeatures(spark, media).collect()
    val payloads = media.select($"media_id", $"payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    feats.foreach { f =>
      val p = payloads(f.media_id)
      val expect = p.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      assert(f.header_checksum == expect)
      assert(f.n_bytes == 128)
      assert(f.features.length == 8)
      // chunk 0 mean recomputed
      val mean0 = p.take(16).map(_ & 0xff).sum / 16.0f
      assert(f.features(0) == mean0)
    }
  }

  test("stub resize: exact output shape, deterministic nearest-neighbor sampling") {
    val out = Multimodal.resize(spark, media, newW = 8, newH = 4).collect()
    assert(out.nonEmpty)
    val payloads = media.select($"media_id", $"payload", $"width", $"height")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3))).toMap
    out.foreach { r =>
      assert(r.width == 8 && r.height == 4 && r.payload.length == 32)
      val (p, w, h) = payloads(r.media_id)
      // spot-check pixel (0,0) and (7,3) against the index math
      assert(r.payload(0) == p(0))
      val sx = (7L * w / 8).toInt; val sy = (3L * h / 4).toInt
      assert(r.payload(3 * 8 + 7) == p((sy * w + sx) % p.length))
    }
    // deterministic across runs
    val again = Multimodal.resize(spark, media, 8, 4).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    assert(out.forall(r => again(r.media_id) == r.payload.toSeq))
  }

  test("frame extraction: 8 frames of 16 bytes, stride sampling halves them") {
    val f1 = Multimodal.frames(media, frameBytes = 16)
    val perMedia = f1.groupBy("media_id").count().select("count").distinct().collect()
    assert(perMedia.map(_.getLong(0)).toSeq == Seq(8L))
    val frame0 = f1.filter($"frame_idx" === 0).select("frame_bytes").head()
      .getAs[Array[Byte]](0)
    assert(frame0.length == 16)
    val f2 = Multimodal.frames(media, frameBytes = 16, stride = 2)
    assert(f2.count() == f1.count() / 2)
  }
}
