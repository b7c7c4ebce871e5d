package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Mp4, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "some text payload"), (2L, "x" * 3000)).toDF("id", "t"), "id", "t")

  test("fromText wraps rows as typed media blobs") {
    val r = media.orderBy("media_id").collect()
    assert(r(0).getAs[Array[Byte]]("bytes").length == 17)
    assert(r(0).getAs[org.apache.spark.sql.Row]("meta").getLong(0) == 17L)
    assert(r(0).getString(1) == "image/fake")
  }

  test("featurize produces fixed-dim deterministic features, drops blobs") {
    val f = Multimodal.featurize(media, Multimodal.StubDecoder)
    assert(f.columns.toSeq == Seq("media_id", "media_type", "n_bytes", "features"))
    val rows = f.orderBy("media_id").collect()
    assert(rows.forall(_.getSeq[Float](3).size == Multimodal.FeatureDim))
    // determinism: same input -> same features
    val again = Multimodal.featurize(media, Multimodal.StubDecoder)
      .orderBy("media_id").collect()
    assert(rows.map(_.getSeq[Float](3)).toSeq == again.map(_.getSeq[Float](3)).toSeq)
  }

  private def testPng(w: Int, h: Int): Array[Byte] = {
    // left half black, right half white
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIODecoder decodes a real PNG: dims, channels, grid luminance") {
    val f = Multimodal.ImageIODecoder.decode("image/png", testPng(8, 6))
    assert(f.length == Multimodal.FeatureDim)
    assert(f(0) == 8f && f(1) == 6f)       // width, height
    assert(f(2) == 3f && f(3) == 0f)       // RGB, no alpha
    // 4x3 grid: columns 0-1 black (lum 0), columns 2-3 white (lum 1)
    val grid = f.drop(4)
    for (cy <- 0 until 3; cx <- 0 until 4) {
      val v = grid(cy * 4 + cx)
      if (cx < 2) assert(v < 0.01f) else assert(v > 0.99f)
    }
  }

  test("featurize with ImageIODecoder over a media frame of real PNGs") {
    val png = testPng(8, 6)
    val mediaDf = Seq((10L, "image/png", png), (11L, "image/png", testPng(4, 4)))
      .toDF("media_id", "media_type", "bytes")
    val rows = Multimodal.featurize(mediaDf, Multimodal.ImageIODecoder)
      .orderBy("media_id").collect()
    assert(rows(0).getSeq[Float](3).take(2) == Seq(8f, 6f))
    assert(rows(1).getSeq[Float](3).take(2) == Seq(4f, 4f))
    // undecodable bytes fail loudly, not silently
    val bad = Seq((12L, "image/png", Array[Byte](1, 2, 3))).toDF("media_id", "media_type", "bytes")
    intercept[org.apache.spark.SparkException] {
      Multimodal.featurize(bad, Multimodal.ImageIODecoder).collect()
    }
  }

  test("thumbnails resizes through real PNG re-encode") {
    val mediaDf = Seq((20L, "image/png", testPng(16, 8))).toDF("media_id", "media_type", "bytes")
    val small = Multimodal.thumbnails(mediaDf, 4, 2).collect()(0).getAs[Array[Byte]]("bytes")
    val back = Multimodal.ImageIODecoder.decode("image/png", small)
    assert(back(0) == 4f && back(1) == 2f)
    // halves survive the bilinear resize
    assert(back(4) < 0.2f && back(7) > 0.8f)
  }

  /** 16-bit signed little-endian mono WAV: a sine at `amp`, `n` frames. */
  private def testWav(rate: Float, n: Int, amp: Double): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (amp * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioDecoder decodes a real WAV: format, duration, block RMS") {
    val f = Multimodal.AudioDecoder.decode("audio/wav", testWav(8000f, 4000, 0.5))
    assert(f.length == Multimodal.FeatureDim)
    assert(f(0) == 8000f && f(1) == 1f && f(2) == 16f) // rate, mono, 16-bit
    assert(math.abs(f(3) - 500f) < 1f)                 // 4000 frames @ 8kHz = 500 ms
    assert(f(4) == 4000f)
    // a constant-amplitude sine has RMS amp/sqrt(2) in every block
    f.drop(5).foreach(r => assert(math.abs(r - 0.5 / math.sqrt(2)) < 0.01, r))
    // silence scores ~0 RMS
    val quiet = Multimodal.AudioDecoder.decode("audio/wav", testWav(8000f, 4000, 0.0))
    quiet.drop(5).foreach(r => assert(r < 1e-4))
  }

  test("featurize with AudioDecoder over a media frame of real WAVs") {
    val mediaDf = Seq(
      (30L, "audio/wav", testWav(8000f, 1600, 0.25)),
      (31L, "audio/wav", testWav(16000f, 1600, 0.25))).toDF("media_id", "media_type", "bytes")
    val rows = Multimodal.featurize(mediaDf, Multimodal.AudioDecoder)
      .orderBy("media_id").collect()
    assert(rows(0).getSeq[Float](3).head == 8000f)
    assert(rows(1).getSeq[Float](3).head == 16000f)
    assert(math.abs(rows(0).getSeq[Float](3)(3) - 200f) < 1f) // 1600/8k = 200 ms
    assert(math.abs(rows(1).getSeq[Float](3)(3) - 100f) < 1f) // 1600/16k = 100 ms
  }

  test("sampleFrames explodes 1KiB blocks at the stride") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 2), 2)
    val idx = frames.select("frame_idx").as[Int].collect().sorted.toSeq
    assert(idx == Seq(0, 2)) // 3000 bytes -> blocks 0,1,2 -> stride 2 keeps 0,2
  }

  // ---- MP4 / ISO-BMFF ----

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val size = payload.length + 8
    Array[Byte](((size >> 24) & 0xff).toByte, ((size >> 16) & 0xff).toByte,
      ((size >> 8) & 0xff).toByte, (size & 0xff).toByte) ++
      typ.getBytes("ISO-8859-1") ++ payload
  }
  private def u32b(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Minimal but spec-shaped MP4: ftyp(isom) + moov(mvhd v0 timescale
    * 1000 / duration 2500, one avc1 video trak with a full 4-sample
    * stsz/stsc/stco table, plus an stss marking samples 1 and 3 as
    * keyframes unless `withStss = false`) + mdat with known sample bytes.
    * Sample layout: 2 chunks × 2 samples, sizes 5,6,7,8.
    */
  private def testMp4(withStss: Boolean = true): (Array[Byte], Seq[Array[Byte]]) = {
    val samples = Seq(
      Array.fill(5)(0xA1.toByte), Array.fill(6)(0xB2.toByte),
      Array.fill(7)(0xC3.toByte), Array.fill(8)(0xD4.toByte))
    val ftyp = box("ftyp", "isom".getBytes ++ u32b(0) ++ "isomavc1".getBytes)
    val mvhd = box("mvhd", new Array[Byte](12) ++ u32b(1000) ++ u32b(2500) ++
      new Array[Byte](80))
    val tkhd = box("tkhd", new Array[Byte](4 + 72) ++
      u32b(320L << 16) ++ u32b(240L << 16)) // v0; 16.16 fixed w/h at +76
    val hdlr = box("hdlr", new Array[Byte](8) ++ "vide".getBytes ++ new Array[Byte](13))
    val stsd = box("stsd", u32b(0) ++ u32b(1) ++ box("avc1", new Array[Byte](70)))
    val stsz = box("stsz", u32b(0) ++ u32b(0) ++ u32b(4) ++
      samples.flatMap(s => u32b(s.length)).toArray)
    val stsc = box("stsc", u32b(0) ++ u32b(1) ++ u32b(1) ++ u32b(2) ++ u32b(1))
    val stss =
      if (withStss) box("stss", u32b(0) ++ u32b(2) ++ u32b(1) ++ u32b(3))
      else Array.empty[Byte]
    // stco needs absolute file offsets: compute sizes of everything first
    def assemble(off1: Long, off2: Long): Array[Byte] = {
      val stco = box("stco", u32b(0) ++ u32b(2) ++ u32b(off1) ++ u32b(off2))
      val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco ++ stss)
      val minf = box("minf", stbl)
      val mdia = box("mdia", hdlr ++ minf)
      val trak = box("trak", tkhd ++ mdia)
      val moov = box("moov", mvhd ++ trak)
      val mdat = box("mdat", samples.flatten.toArray)
      ftyp ++ moov ++ mdat
    }
    val probe = assemble(0, 0)
    val mdatPayload = probe.length - samples.map(_.length).sum
    (assemble(mdatPayload, mdatPayload + 11), samples)
  }

  test("Mp4Decoder parses a generated MP4: duration, track, codec, dims") {
    val (mp4, samples) = testMp4()
    val f = Multimodal.Mp4Decoder.decode("video/mp4", mp4)
    assert(f.length == Multimodal.FeatureDim)
    assert(f(0) == 2500f && f(1) == 1000f) // duration_ms (2500/1000 * 1000), timescale
    assert(f(2) == 1f)                     // one track
    assert(f(3) == 320f && f(4) == 240f)   // tkhd 16.16 width/height
    assert(f.slice(5, 9).map(_.toChar).mkString == "avc1")
    assert(f(9) == samples.map(_.length).sum.toFloat) // mdat bytes
    assert(f(10) == 4f)                    // demuxed sample count
    // non-BMFF bytes raise like the other real decoders
    intercept[IllegalArgumentException] {
      Multimodal.Mp4Decoder.decode("video/mp4", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 1, 2))
    }
  }

  test("Mp4Decoder frame-payload profile: size stats + keyframe cadence") {
    val (mp4, samples) = testMp4() // stss marks samples 1 and 3
    val f = Multimodal.Mp4Decoder.decode("video/mp4", mp4)
    assert(f(12) == samples.map(_.length).sum.toFloat / 4) // mean frame bytes (6.5)
    assert(f(13) == 8f)                                    // max frame bytes
    assert(f(14) == 2f)                                    // stss keyframes
    assert(f(15) == 2f)                                    // 4 samples / 2 keyframes
    assert(Mp4.syncSamples(mp4) == Seq(1, 3))
    // no stss box => every sample is a sync sample (spec 8.6.2 fallback)
    val (bare, _) = testMp4(withStss = false)
    val g = Multimodal.Mp4Decoder.decode("video/mp4", bare)
    assert(Mp4.syncSamples(bare).isEmpty)
    assert(g(14) == 4f && g(15) == 1f)
  }

  test("sampleFrames demuxes real MP4 samples via stsz/stsc/stco") {
    val (mp4, samples) = testMp4()
    val mediaDf = Seq((40L, "video/mp4", mp4)).toDF("media_id", "media_type", "bytes")
    val frames = Multimodal.sampleFrames(mediaDf, 1)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    for (i <- 0 until 4)
      assert(frames(i).getAs[Array[Byte]]("frame_bytes").toSeq == samples(i).toSeq, s"sample $i")
    // stride skips demuxed samples, not byte blocks
    val strided = Multimodal.sampleFrames(mediaDf, 2)
      .select("frame_idx").as[Int].collect().sorted.toSeq
    assert(strided == Seq(0, 2))
  }
}
