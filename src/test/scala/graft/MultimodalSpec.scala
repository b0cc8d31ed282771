package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{MediaCodec, Multimodal}
import graft.ops.MediaCodec.{ImageRgb, WavPcm}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("media metadata extraction is deterministic and partition-parallel") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val withMedia = Multimodal.withMediaColumn(docs)
    val meta = Multimodal.extractMeta(spark, withMedia).collect()
    assert(meta.length == docs.count())
    assert(meta.forall(m => m.byteLen > 0 && m.width >= 320 && m.digest.length == 32))
    // deterministic across runs
    val meta2 = Multimodal.extractMeta(spark, withMedia).collect()
    assert(meta.sortBy(_.doc_id).toSeq == meta2.sortBy(_.doc_id).toSeq)
    assert(meta.map(_.kind).toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("frame sampling fans out bounded rows per doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val frames = Multimodal.sampleFrames(spark, Multimodal.withMediaColumn(docs),
      everyMs = 10000L, maxFrames = 4).collect()
    val perDoc = frames.groupBy(_.doc_id).view.mapValues(_.length)
    assert(perDoc.values.forall(n => n >= 1 && n <= 4))
    assert(frames.forall(_.pixels.length == 64))
    // frames are deterministic functions of (payload, frameIdx)
    val f0 = frames.filter(f => f.doc_id == frames.head.doc_id).sortBy(_.frameIdx)
    assert(f0.map(_.ts_ms).toSeq == f0.indices.map(_ * 10000L))
  }

  // deterministic gradient image: pixel (x,y) = (x*7, y*11, (x+y)) mod 256
  private def gradient(w: Int, h: Int): ImageRgb = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = (x * 7 % 256).toByte
      rgb(i + 1) = (y * 11 % 256).toByte
      rgb(i + 2) = ((x + y) % 256).toByte
    }
    ImageRgb(w, h, rgb)
  }

  test("PPM and BMP roundtrip byte-exact pixels; sniff routes by magic") {
    val img = gradient(17, 9) // odd width exercises BMP row padding
    val ppm = MediaCodec.encodePpm(img)
    val bmp = MediaCodec.encodeBmp(img)
    assert(MediaCodec.sniff(ppm).contains("image/ppm"))
    assert(MediaCodec.sniff(bmp).contains("image/bmp"))
    val dp = MediaCodec.decodePpm(ppm)
    val db = MediaCodec.decodeBmp(bmp)
    assert(dp.width == 17 && dp.height == 9 && dp.rgb.toSeq == img.rgb.toSeq)
    assert(db.width == 17 && db.height == 9 && db.rgb.toSeq == img.rgb.toSeq)
    // PPM comments in the header are tolerated
    val commented = ("P6\n# a comment\n17 9\n255\n").getBytes("US-ASCII") ++
      img.rgb
    assert(MediaCodec.decodePpm(commented).rgb.toSeq == img.rgb.toSeq)
  }

  test("WAV roundtrip: samples, rate, duration") {
    val samples = Array.tabulate(8000)(i => (math.sin(i * 0.05) * 10000).toShort)
    val wav = MediaCodec.encodeWav(WavPcm(8000, 1, samples))
    assert(MediaCodec.sniff(wav).contains("audio/wav"))
    val d = MediaCodec.decodeWav(wav)
    assert(d.sampleRate == 8000 && d.channels == 1)
    assert(d.samples.toSeq == samples.toSeq)
    assert(d.durationMs == 1000L)
    val rms = MediaCodec.rmsWindows(d, 100)
    assert(rms.length == 10 && rms.forall(v => v > 6000 && v < 8000)) // sine RMS ~ a/sqrt2
  }

  test("dHash: stable under resize and brightness shift, far for different images") {
    val a = gradient(64, 48)
    val aBig = MediaCodec.resizeNearest(a, 128, 96)
    // uniform brightness shift preserves all left<right comparisons
    val aBright = ImageRgb(a.width, a.height,
      a.rgb.map(b => math.min(255, (b & 0xff) + 30).toByte))
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val hA = MediaCodec.dHash(a)
    assert(ham(hA, MediaCodec.dHash(aBig)) <= 6)
    assert(ham(hA, MediaCodec.dHash(aBright)) <= 10)
    // an inverted gradient flips the horizontal comparisons -> far
    val b = ImageRgb(a.width, a.height, a.rgb.map(v => (255 - (v & 0xff)).toByte))
    assert(ham(hA, MediaCodec.dHash(b)) > 24)
  }

  test("JPEG/PNG/GIF/TIFF decode via the JDK ImageIO plugins") {
    val img = gradient(17, 9) // 153 pixels -> <=256 distinct colors, GIF palette lossless
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val hRef = MediaCodec.dHash(img)
    // lossless formats: bit-exact RGB back out
    for (fmt <- Seq("png", "gif", "tiff")) {
      val enc = MediaCodec.encodeJavax(img, fmt)
      assert(MediaCodec.sniff(enc).contains(s"image/$fmt"), s"sniff $fmt")
      val dec = MediaCodec.decodeImage(enc)
      assert(dec.width == 17 && dec.height == 9, fmt)
      assert(dec.rgb.toSeq == img.rgb.toSeq, s"$fmt roundtrip not lossless")
    }
    // ImageIO's own BMP writer emits 24-bit BI_RGB our hand decoder reads
    val bmp = MediaCodec.encodeJavax(img, "bmp")
    assert(MediaCodec.sniff(bmp).contains("image/bmp"))
    assert(MediaCodec.decodeImage(bmp).rgb.toSeq == img.rgb.toSeq)
    // JPEG is lossy: dimensions exact, pixels close, perceptual hash near
    val jpg = MediaCodec.encodeJavax(img, "jpg")
    assert(MediaCodec.sniff(jpg).contains("image/jpeg"))
    val dj = MediaCodec.decodeImage(jpg)
    assert(dj.width == 17 && dj.height == 9)
    assert(ham(hRef, MediaCodec.dHash(dj)) <= 12, "JPEG dHash drifted too far")
    // determinism: same input -> same encoded bytes -> same decode
    assert(MediaCodec.encodeJavax(img, "jpg").toSeq == jpg.toSeq)
  }

  test("AIFF decode via javax.sound matches the PCM source") {
    val samples = Array.tabulate(4000)(i => (math.sin(i * 0.03) * 9000).toShort)
    val aiff = MediaCodec.encodeAiff(WavPcm(8000, 1, samples))
    assert(MediaCodec.sniff(aiff).contains("audio/aiff"))
    val d = MediaCodec.decodeJavaxAudio(aiff)
    assert(d.sampleRate == 8000 && d.channels == 1)
    assert(d.samples.toSeq == samples.toSeq)
    assert(d.durationMs == 500L)
  }

  test("animated GIF: encode/decode frame sequence with delays; real frame sampling") {
    // 4 constant-color frames, 250 ms each
    def flat(r: Int, g: Int, b: Int): ImageRgb = {
      val rgb = new Array[Byte](20 * 10 * 3)
      var i = 0
      while (i < rgb.length) { rgb(i) = r.toByte; rgb(i+1) = g.toByte; rgb(i+2) = b.toByte; i += 3 }
      ImageRgb(20, 10, rgb)
    }
    val frames = Seq(flat(10, 20, 30), flat(80, 20, 30), flat(150, 20, 30), flat(220, 20, 30))
    val gif = MediaCodec.encodeAnimatedGif(frames, delayMs = 250)
    assert(MediaCodec.sniff(gif).contains("image/gif"))
    assert(MediaCodec.gifFrameCount(gif) == 4)
    val seq = MediaCodec.decodeGifFrames(gif)
    assert(seq.width == 20 && seq.height == 10)
    assert(seq.delaysMs.toSeq == Seq(250, 250, 250, 250) && seq.durationMs == 1000L)
    for ((f, i) <- seq.frames.zipWithIndex)
      assert(f.rgb.toSeq == frames(i).rgb.toSeq, s"frame $i not lossless")
    // single-frame GIF stays an image (not video) in extractMeta
    val still = MediaCodec.encodeJavax(flat(5, 6, 7), "gif")
    assert(MediaCodec.gifFrameCount(still) == 1)

    // through Spark: video kind + duration in extractMeta, real sampled thumbs
    import spark.implicits._
    val df = Seq((1L, gif), (2L, still)).toDF("doc_id", "media")
    val meta = Multimodal.extractMeta(spark, df).collect().sortBy(_.doc_id)
    assert(meta(0).kind == "video" && meta(0).durationMs == 1000L &&
      meta(0).width == 20 && meta(0).height == 10)
    assert(meta(1).kind == "image")
    val sampled = Multimodal.sampleFrames(spark, df.where($"doc_id" === 1L),
      everyMs = 250L, maxFrames = 8).collect().sortBy(_.frameIdx)
    assert(sampled.length == 4)
    for ((fr, i) <- sampled.zipWithIndex) {
      assert(fr.ts_ms == i * 250L && fr.pixels.length == 16 * 16 * 3)
      assert((fr.pixels(0) & 0xff) == Seq(10, 80, 150, 220)(i), s"sample $i wrong frame")
    }
  }

  test("MJPEG-in-AVI: container roundtrip, real frame decode, Spark meta + sampling") {
    def flat(r: Int, g: Int, b: Int): ImageRgb = {
      val rgb = new Array[Byte](16 * 12 * 3)
      var i = 0
      while (i < rgb.length) { rgb(i) = r.toByte; rgb(i+1) = g.toByte; rgb(i+2) = b.toByte; i += 3 }
      ImageRgb(16, 12, rgb)
    }
    val src = Seq(flat(10, 100, 64), flat(70, 100, 64), flat(130, 100, 64), flat(200, 100, 64))
    val avi = MediaCodec.encodeAviMjpeg(src, frameMs = 250)
    assert(MediaCodec.sniff(avi).contains("video/avi"))
    val seq = MediaCodec.decodeAvi(avi)
    assert(seq.width == 16 && seq.height == 12)
    assert(seq.delaysMs.toSeq == Seq(250, 250, 250, 250) && seq.durationMs == 1000L)
    assert(seq.frames.length == 4)
    // MJPEG is lossy: constant-color frames at quality 1.0 must round-trip
    // within ±2/channel (all-ones luma table; YCbCr integer rounding)
    var maxErr = 0
    for ((f, i) <- seq.frames.zipWithIndex; j <- f.rgb.indices)
      maxErr = math.max(maxErr, math.abs((f.rgb(j) & 0xff) - (src(i).rgb(j) & 0xff)))
    info(s"MJPEG max per-channel round-trip error: $maxErr")
    assert(maxErr <= 2, s"MJPEG round-trip error $maxErr exceeds tolerance")

    // through Spark: real video meta + frame sampling via the AVI branch
    import spark.implicits._
    val df = Seq((1L, avi)).toDF("doc_id", "media")
    val meta = Multimodal.extractMeta(spark, df).collect()
    assert(meta(0).kind == "video" && meta(0).durationMs == 1000L &&
      meta(0).width == 16 && meta(0).height == 12)
    val sampled = Multimodal.sampleFrames(spark, df, everyMs = 250L, maxFrames = 8)
      .collect().sortBy(_.frameIdx)
    assert(sampled.length == 4)
    for ((fr, i) <- sampled.zipWithIndex) {
      assert(fr.ts_ms == i * 250L && fr.pixels.length == 16 * 16 * 3)
      val red = fr.pixels(0) & 0xff
      val want = Seq(10, 70, 130, 200)(i)
      assert(math.abs(red - want) <= 2, s"sample $i red $red != ~$want")
    }
  }

  test("AVI fuzz: random dims (incl. odd), frame counts, colors, periods roundtrip") {
    val rnd = new scala.util.Random(20260821L)
    for (trial <- 0 until 25) {
      val w = 8 + rnd.nextInt(25) // odd widths exercise RIFF chunk padding
      val h = 6 + rnd.nextInt(19)
      val n = 1 + rnd.nextInt(6)
      val frameMs = Seq(40, 100, 250, 1000)(rnd.nextInt(4))
      val colors = Array.fill(n)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val frames = colors.toSeq.map { case (r, g, b) =>
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < rgb.length) { rgb(i)=r.toByte; rgb(i+1)=g.toByte; rgb(i+2)=b.toByte; i += 3 }
        ImageRgb(w, h, rgb)
      }
      val avi = MediaCodec.encodeAviMjpeg(frames, frameMs)
      assert(MediaCodec.sniff(avi).contains("video/avi"), s"trial $trial sniff")
      val seq = MediaCodec.decodeAvi(avi)
      assert(seq.width == w && seq.height == h, s"trial $trial dims")
      assert(seq.frames.length == n, s"trial $trial frame count")
      assert(seq.delaysMs.forall(_ == frameMs) && seq.durationMs == n.toLong * frameMs,
        s"trial $trial delays")
      for ((f, i) <- seq.frames.zipWithIndex) {
        val (r, g, b) = colors(i)
        // constant frames at quality 1.0: YCbCr integer rounding only
        for ((want, off) <- Seq(r -> 0, g -> 1, b -> 2)) {
          val got = f.rgb(off) & 0xff
          assert(math.abs(got - want) <= 3,
            s"trial $trial frame $i channel $off: $got vs $want")
        }
      }
    }
  }

  test("mixed-format corpus through Spark: ImageIO images + AIFF audio") {
    import spark.implicits._
    val rows = (0L until 40L).map { i =>
      val media = (i % 4) match {
        case 0 => MediaCodec.encodeJavax(gradient(20 + (i % 5).toInt, 10), "png")
        case 1 => MediaCodec.encodeJavax(gradient(20 + (i % 5).toInt, 10), "jpg")
        case 2 => MediaCodec.encodeAiff(WavPcm(8000, 1, new Array[Short]((300 + i.toInt) * 8)))
        case _ => MediaCodec.encodePpm(gradient(20 + (i % 5).toInt, 10))
      }
      (i, media)
    }
    val df = rows.toDF("doc_id", "media")
    val meta = Multimodal.extractMeta(spark, df).collect().sortBy(_.doc_id)
    meta.foreach { m =>
      if (m.doc_id % 4 == 2) assert(m.kind == "audio" && m.durationMs == 300 + m.doc_id)
      else assert(m.kind == "image" && m.width == 20 + (m.doc_id % 5) && m.height == 10)
    }
    // every image format lands a dHash row; PNG and PPM of the same gradient collide
    val hashes = Multimodal.imageHashes(spark, df).as[(Long, Long)].collect().toMap
    assert(hashes.keySet == (0L until 40L).filter(_ % 4 != 2).toSet)
    val pngOf = hashes.filter(_._1 % 4 == 0)
    val ppmOf = hashes.filter(_._1 % 4 == 3)
    for ((i, h) <- pngOf; (j, g) <- ppmOf if i % 5 == j % 5)
      assert(h == g, s"lossless PNG($i) vs PPM($j) dHash must match")
    // AIFF flows through the audio-energy pass
    val energy = Multimodal.audioEnergy(spark, df).collect()
    assert(energy.length == 10 && energy.forall(_.getLong(1) > 0))
  }

  test("real decode path through Spark: mixed PPM/WAV corpus, imageHashes") {
    import spark.implicits._
    val rows = (0L until 60L).map { i =>
      val media =
        if (i % 3 == 0) MediaCodec.encodeWav(WavPcm(8000, 1, new Array[Short]((500 + i.toInt) * 8)))
        else MediaCodec.encodePpm(gradient(16 + (i % 16).toInt, 8 + (i % 8).toInt))
      (i, media)
    }
    val df = rows.toDF("doc_id", "media")
    val meta = Multimodal.extractMeta(spark, df).collect().sortBy(_.doc_id)
    meta.foreach { m =>
      if (m.doc_id % 3 == 0) {
        assert(m.kind == "audio" && m.durationMs == 500 + m.doc_id) // (500+i)*8 samples @8k
      } else {
        assert(m.kind == "image")
        assert(m.width == 16 + (m.doc_id % 16) && m.height == 8 + (m.doc_id % 8))
      }
    }
    // image hashes: one row per image; identical gradients collide exactly
    val hashes = Multimodal.imageHashes(spark, df).as[(Long, Long)].collect().toMap
    assert(hashes.keySet == (0L until 60L).filter(_ % 3 != 0).toSet)
    val same = rows.collect { case (i, _) if i % 3 != 0 && i % 16 == 1 && i % 8 == 1 => i }
    if (same.size >= 2) // identical (w,h) gradients -> identical dHash
      assert(same.map(hashes).toSet.size == 1)
  }

  test("decodeAvi terminates (fails fast) on malformed RIFF payloads") {
    def withChunkLen(len: Int): Array[Byte] = {
      // minimal RIFF/AVI shell: header + one chunk whose length we control
      val b = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(24).put("AVI ".getBytes("US-ASCII"))
      b.put("avih".getBytes("US-ASCII")).putInt(len)
      b.put(Array.fill[Byte](12)(0))
      b.array()
    }
    // negative chunk length: i = body + len + (len & 1) would move the
    // cursor BACKWARD (len = -8 leaves it stationary) — must throw, not spin
    for (len <- Seq(-8, -1, Int.MinValue))
      assertThrows[IllegalArgumentException](MediaCodec.decodeAvi(withChunkLen(len)))
    // overlong chunk/LIST lengths: bounds must clamp to the buffer
    val overlong = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(Int.MaxValue - 8)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(Int.MaxValue - 20)
      .put("movi".getBytes("US-ASCII")).put(Array.fill[Byte](8)(0)).array()
    // walks to the clamped end, finds no frames -> the normal empty error
    assertThrows[IllegalArgumentException](MediaCodec.decodeAvi(overlong))
    // truncated avih must throw, not read out of bounds
    assertThrows[IllegalArgumentException](MediaCodec.decodeAvi(withChunkLen(40)))
    // and a well-formed file still decodes after the guards
    val ok = MediaCodec.encodeAviMjpeg(
      Seq(ImageRgb(8, 8, Array.fill[Byte](8 * 8 * 3)(64))), frameMs = 100)
    assert(MediaCodec.decodeAvi(ok).frames.length == 1)
  }
}
