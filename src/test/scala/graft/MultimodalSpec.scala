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
}
