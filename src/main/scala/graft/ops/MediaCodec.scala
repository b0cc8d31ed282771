package graft.ops

/** Real, pure-JVM media codecs for the self-contained formats — no native
  * or external libraries needed, so the multimodal decode step is REAL for
  * these (the `FakeCodec` stub remains only for container-absent codecs
  * like JPEG/H.264):
  *
  *   - PPM (P6 binary): header tokens + raw RGB
  *   - BMP (uncompressed 24-bit BI_RGB): bottom-up padded BGR rows
  *   - WAV (RIFF PCM 16-bit): fmt/data chunk walk
  *
  * Plus the typical feature-extract steps over the decoded forms:
  * nearest-neighbor resize, 64-bit difference hash (dHash — Krawetz's
  * perceptual hash: 9x8 grayscale, bit = left<right) for image near-dup,
  * and RMS energy windows for audio.
  *
  * All functions are deterministic pure byte->value transforms, built to run
  * inside `mapPartitions` (no per-row allocation beyond outputs, no driver
  * state), matching the partition-parallel decode shape in [[Multimodal]].
  */
object MediaCodec {

  final case class ImageRgb(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3, s"rgb len ${rgb.length} != $width x $height x3")
    @inline def gray(x: Int, y: Int): Int = {
      val i = (y * width + x) * 3
      // integer Rec.601 luma
      (299 * (rgb(i) & 0xff) + 587 * (rgb(i + 1) & 0xff) + 114 * (rgb(i + 2) & 0xff)) / 1000
    }
  }
  final case class WavPcm(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def durationMs: Long =
      if (sampleRate == 0 || channels == 0) 0L
      else samples.length.toLong * 1000L / (sampleRate.toLong * channels)
  }

  /** Magic-byte sniff: Some(mime) for formats this codec really decodes. */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') Some("image/ppm")
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("image/bmp")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
      bytes(11) == 'E') Some("audio/wav")
    else None

  // ------------------------------------------------------------------ PPM

  /** P6: `P6 <ws> width <ws> height <ws> maxval <single-ws> raw-RGB`;
    * `#` comments allowed inside the header whitespace.
    */
  def decodePpm(bytes: Array[Byte]): ImageRgb = {
    var p = 2
    def skipWs(): Unit = {
      var go = true
      while (go && p < bytes.length) {
        val c = bytes(p)
        if (c == '#') { while (p < bytes.length && bytes(p) != '\n') p += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') p += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
        v = v * 10 + (bytes(p) - '0'); p += 1
      }
      v
    }
    val w = int(); val h = int(); val maxv = int()
    require(maxv == 255, s"only maxval 255 supported, got $maxv")
    p += 1 // exactly one whitespace byte before the raster
    val n = w * h * 3
    require(bytes.length - p >= n, s"truncated PPM: need $n raster bytes")
    ImageRgb(w, h, java.util.Arrays.copyOfRange(bytes, p, p + n))
  }

  def encodePpm(img: ImageRgb): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  // ------------------------------------------------------------------ BMP

  @inline private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Uncompressed 24-bit BI_RGB, the classic bottom-up padded-BGR layout. */
  def decodeBmp(bytes: Array[Byte]): ImageRgb = {
    val dataOffset = le32(bytes, 10)
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(bpp == 24 && compression == 0, s"only 24-bit BI_RGB supported (bpp=$bpp comp=$compression)")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val rowBytes = (w * 3 + 3) & ~3 // rows pad to 4
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = bytes(s + 2) // B,G,R -> R,G,B
        rgb(d + 1) = bytes(s + 1)
        rgb(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    ImageRgb(w, h, rgb)
  }

  def encodeBmp(img: ImageRgb): Array[Byte] = {
    val rowBytes = (img.width * 3 + 3) & ~3
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    def w16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def w32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    w32(2, 54 + dataSize); w32(10, 54); w32(14, 40)
    w32(18, img.width); w32(22, img.height)
    w16(26, 1); w16(28, 24); w32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dstRow = 54 + (img.height - 1 - y) * rowBytes
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = dstRow + x * 3
        out(d) = img.rgb(s + 2); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------------ WAV

  /** RIFF/WAVE chunk walk; PCM (format 1), 16-bit only. */
  def decodeWav(bytes: Array[Byte]): WavPcm = {
    var p = 12
    var rate = 0
    var channels = 0
    var samples: Array[Short] = Array.emptyShortArray
    while (p + 8 <= bytes.length) {
      val id = new String(bytes, p, 4, "US-ASCII")
      val size = le32(bytes, p + 4)
      if (id == "fmt ") {
        require(le16(bytes, p + 8) == 1, "only PCM wav supported")
        channels = le16(bytes, p + 10)
        rate = le32(bytes, p + 12)
        require(le16(bytes, p + 22) == 16, "only 16-bit wav supported")
      } else if (id == "data") {
        val n = math.min(size, bytes.length - p - 8) / 2
        samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = le16(bytes, p + 8 + i * 2).toShort; i += 1 }
      }
      p += 8 + size + (size & 1) // chunks pad to even
    }
    WavPcm(rate, channels, samples)
  }

  def encodeWav(pcm: WavPcm): Array[Byte] = {
    val dataSize = pcm.samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def w16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def w32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    def tag(i: Int, s: String): Unit = s.getBytes("US-ASCII").zipWithIndex
      .foreach { case (b, j) => out(i + j) = b }
    tag(0, "RIFF"); w32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, pcm.channels)
    w32(24, pcm.sampleRate)
    w32(28, pcm.sampleRate * pcm.channels * 2); w16(32, pcm.channels * 2); w16(34, 16)
    tag(36, "data"); w32(40, dataSize)
    var i = 0
    while (i < pcm.samples.length) { w16(44 + i * 2, pcm.samples(i) & 0xffff); i += 1 }
    out
  }

  // -------------------------------------------------- feature extraction

  /** Nearest-neighbor resize — the standard cheap pre-hash normalization. */
  def resizeNearest(img: ImageRgb, w: Int, h: Int): ImageRgb = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        val sx = x * img.width / w
        val s = (sy * img.width + sx) * 3
        val d = (y * w + x) * 3
        rgb(d) = img.rgb(s); rgb(d + 1) = img.rgb(s + 1); rgb(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    ImageRgb(w, h, rgb)
  }

  /** 64-bit difference hash: 9x8 grayscale, bit (r*8+c) set iff
    * gray(c,r) < gray(c+1,r). Robust to brightness shifts and resizes;
    * hamming distance between hashes approximates visual difference.
    */
  def dHash(img: ImageRgb): Long = {
    val small = resizeNearest(img, 9, 8)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (small.gray(c, r) < small.gray(c + 1, r)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** RMS energy per fixed-length window — the canonical cheap audio
    * feature (silence detection, loudness normalization inputs).
    */
  def rmsWindows(pcm: WavPcm, windowMs: Int): Array[Double] = {
    val perWin = math.max(1, pcm.sampleRate * pcm.channels * windowMs / 1000)
    val n = (pcm.samples.length + perWin - 1) / perWin
    val out = new Array[Double](n)
    var w = 0
    while (w < n) {
      val from = w * perWin
      val to = math.min(from + perWin, pcm.samples.length)
      var acc = 0.0
      var i = from
      while (i < to) { val s = pcm.samples(i).toDouble; acc += s * s; i += 1 }
      out(w) = math.sqrt(acc / math.max(1, to - from))
      w += 1
    }
    out
  }
}
