package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Real-codec tests: synthesized payloads must be valid BMP/WAV/BMP-
  * sequence binaries, and every parsed field must round-trip the
  * encoder's parameters — plus codec unit tests independent of Spark. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media =
    Multimodal.synthesizeFromDocs(spark.read.parquet(s"$sf/documents.parquet"))

  test("bmp codec round-trips header fields and pixels, incl. padded widths") {
    for (w <- Seq(3, 4, 5, 8); h <- Seq(1, 2, 3)) {
      val src = Multimodal.encodeBmp(w, h, g => (g * 7 + 3).toByte)
      val d = Multimodal.decodeBmp(src)
      assert(d.width == w && d.height == h && d.bitsPerPixel == 24)
      assert(d.fileSize == src.length)
      assert(d.pixels.toSeq == (0 until w * h * 3).map(g => (g * 7 + 3).toByte))
    }
  }

  test("wav codec round-trips rate, sample count and data bytes") {
    val src = Multimodal.encodeWav(11000, 24, i => (i * 5).toByte)
    val d = Multimodal.decodeWav(src)
    assert(d.sampleRate == 11000 && d.nSamples == 24)
    assert(d.bitsPerSample == 16 && d.channels == 1)
    assert(d.data.toSeq == (0 until 48).map(i => (i * 5).toByte))
  }

  test("synthesized payloads are real self-describing media") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      r.getAs[String]("modality") match {
        case "image" =>
          val d = Multimodal.decodeBmp(p)
          assert(d.width == r.getAs[Int]("width"))
          assert(d.height == r.getAs[Int]("height"))
          assert(d.fileSize == p.length)
        case "audio" =>
          val d = Multimodal.decodeWav(p)
          assert(d.sampleRate == r.getAs[Int]("width"))
          assert(d.nSamples == r.getAs[Int]("height"))
        case "video" =>
          val offs = Multimodal.bmpFrameOffsets(p)
          assert(offs.size >= 2)
          offs.foreach { o =>
            val f = Multimodal.decodeBmp(p, o)
            assert(f.width == 4 && f.height == 3)
          }
        case other => fail(s"unknown modality $other")
      }
    }
  }

  test("extractFeatures parses headers and decoded bytes, not metadata") {
    val feats = Multimodal.extractFeatures(spark, media).collect()
    val byId = media.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val src = byId(f.media_id)
      val p = src.getAs[Array[Byte]]("payload")
      assert(f.n_bytes == p.length)
      f.modality match {
        case "image" =>
          assert(f.dim1 == src.getAs[Int]("width") && f.dim2 == src.getAs[Int]("height"))
          assert(f.n_units == 1)
          assert(f.features.length == f.dim2) // one mean per pixel row
          assert(f.head_byte == (Multimodal.decodeBmp(p).pixels(0) & 0xff))
        case "audio" =>
          assert(f.dim1 == src.getAs[Int]("width"))  // sample rate
          assert(f.dim2 == src.getAs[Int]("height")) // sample count
          assert(f.n_units == f.dim2)
          assert(f.features.length == f.dim2 / 8)    // per-8-sample blocks
        case "video" =>
          assert(f.dim1 == 4 && f.dim2 == 3)
          assert(f.n_units == Multimodal.bmpFrameOffsets(p).size)
          assert(f.features.length == f.n_units)     // one mean per frame
      }
    }
  }

  test("resize produces a valid BMP with exact nearest-neighbor pixels") {
    val images = media.filter($"modality" === "image")
    val out = Multimodal.resize(spark, images, newW = 8, newH = 4).collect()
    assert(out.nonEmpty)
    val srcById = images.collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("payload")).toMap
    out.foreach { r =>
      val d = Multimodal.decodeBmp(r.payload)
      assert(d.width == 8 && d.height == 4)
      val s = Multimodal.decodeBmp(srcById(r.media_id))
      for (y <- 0 until 4; x <- 0 until 8; c <- 0 until 3) {
        val sx = (x.toLong * s.width / 8).toInt
        val sy = (y.toLong * s.height / 4).toInt
        assert(d.pixels((y * 8 + x) * 3 + c) == s.pixels((sy * s.width + sx) * 3 + c))
      }
    }
    // deterministic across runs
    val again = Multimodal.resize(spark, images, 8, 4).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    assert(out.forall(r => again(r.media_id) == r.payload.toSeq))
  }

  test("fixed-size frame splitter recovers whole parseable BMP frames") {
    val video = media.filter($"modality" === "video")
    val f1 = Multimodal.frames(video, frameBytes = 90)
    val counts = f1.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = video.collect().map(r => r.getAs[Long]("media_id") ->
      Multimodal.bmpFrameOffsets(r.getAs[Array[Byte]]("payload")).size.toLong).toMap
    assert(counts == expected)
    // every split frame parses standalone, and frame 1 differs from frame 0
    val byIdx = f1.filter($"media_id" === counts.keys.min)
      .orderBy("frame_idx").collect()
      .map(r => r.getAs[Array[Byte]]("frame_bytes"))
    byIdx.foreach { fb =>
      val d = Multimodal.decodeBmp(fb)
      assert(d.width == 4 && d.height == 3 && d.fileSize == 90)
    }
    assert(byIdx(0).toSeq != byIdx(1).toSeq) // pixel phase shifts per frame
    // stride keeps every other frame
    val f2 = Multimodal.frames(video, frameBytes = 90, stride = 2)
    val c2 = f2.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2 == expected.map { case (k, v) => k -> ((v + 1) / 2) })
  }
}
