package graft.ops

/** Real media codecs — pure JVM, no external libraries, so the multimodal
  * decode step is REAL for every common web image format plus WAV/AIFF
  * audio (the `FakeCodec` stub remains only for codecs the JVM genuinely
  * lacks, i.e. H.264-class video):
  *
  *   - PPM (P6 binary): header tokens + raw RGB (hand-rolled)
  *   - BMP (uncompressed 24-bit BI_RGB): bottom-up padded BGR rows (hand-rolled)
  *   - JPEG / PNG / GIF / TIFF: the JDK's own ImageIO plugins (java.desktop)
  *   - WAV (RIFF PCM 16-bit): fmt/data chunk walk (hand-rolled)
  *   - AIFF / AU: javax.sound.sampled with PCM_SIGNED 16-bit transcode
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

  // ImageIO's default stream cache spills every image stream to a temp FILE
  // — pure overhead for in-memory payloads and a disk hotspot under 32
  // concurrent decode tasks. Heap-backed streams instead.
  javax.imageio.ImageIO.setUseCache(false)

  /** Magic-byte sniff: Some(mime) for formats this codec really decodes.
    * JPEG/PNG/GIF/TIFF decode through the JDK's own ImageIO plugins
    * (java.desktop ships them — no external libraries), the rest are the
    * hand-rolled pure-JVM decoders below.
    */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') Some("image/ppm")
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("image/bmp")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff) Some("image/jpeg")
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') Some("image/png")
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8') Some("image/gif")
    else if (bytes.length >= 4 && ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 &&
      bytes(3) == 0) || (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 &&
      bytes(3) == 42))) Some("image/tiff")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
      bytes(11) == 'E') Some("audio/wav")
    else if (bytes.length >= 12 && bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' &&
      bytes(3) == 'M' && bytes(8) == 'A' && bytes(9) == 'I' && bytes(10) == 'F' &&
      bytes(11) == 'F') Some("audio/aiff")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' &&
      bytes(11) == ' ') Some("video/avi")
    else None

  /** True when [[decodeImage]] can handle the payload. */
  def isImage(mime: String): Boolean = mime.startsWith("image/")

  /** Decode any sniffed image format to RGB: PPM/BMP via the hand-rolled
    * decoders, JPEG/PNG/GIF/TIFF via the JDK's ImageIO plugins (headless-safe;
    * GIF yields the first frame).
    */
  def decodeImage(bytes: Array[Byte]): ImageRgb = sniff(bytes) match {
    case Some("image/ppm") => decodePpm(bytes)
    case Some("image/bmp") => decodeBmp(bytes)
    case Some(m) if m.startsWith("image/") => decodeJavax(bytes)
    case other => throw new IllegalArgumentException(s"not an image payload: $other")
  }

  /** JDK ImageIO decode (JPEG/PNG/GIF/TIFF) to packed RGB. */
  def decodeJavax(bytes: Array[Byte]): ImageRgb = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO could not decode payload")
    val w = img.getWidth; val h = img.getHeight
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      rgb(i * 3) = ((p >> 16) & 0xff).toByte
      rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
      rgb(i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    ImageRgb(w, h, rgb)
  }

  /** Encode via a JDK ImageIO writer plugin: "png", "jpg", "gif", "tiff",
    * "bmp" — for fixture generation and re-encode pipelines.
    */
  def encodeJavax(img: ImageRgb, format: String): Array[Byte] = {
    val bi = toBuffered(img)
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(bi, format, bos), s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Decode AIFF/AU (and WAV) through the JDK's javax.sound.sampled to
    * 16-bit PCM. Non-16-bit or compressed streams are converted by the
    * platform's PCM_SIGNED transcoder when one exists.
    */
  def decodeJavaxAudio(bytes: Array[Byte]): WavPcm = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in0 = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    val f0 = in0.getFormat
    val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, f0.getSampleRate,
      16, f0.getChannels, f0.getChannels * 2, f0.getSampleRate, false)
    val in = if (f0.matches(target)) in0 else AudioSystem.getAudioInputStream(target, in0)
    val raw = in.readAllBytes()
    val samples = new Array[Short](raw.length / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((raw(i * 2) & 0xff) | (raw(i * 2 + 1) << 8)).toShort
      i += 1
    }
    WavPcm(target.getSampleRate.toInt, target.getChannels, samples)
  }

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

  /** Encode 16-bit PCM as AIFF via javax.sound (fixture generation for the
    * [[decodeJavaxAudio]] path).
    */
  def encodeAiff(pcm: WavPcm): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, pcm.sampleRate.toFloat,
      16, pcm.channels, pcm.channels * 2, pcm.sampleRate.toFloat, true) // AIFF is big-endian
    val raw = new Array[Byte](pcm.samples.length * 2)
    var i = 0
    while (i < pcm.samples.length) {
      raw(i * 2) = (pcm.samples(i) >> 8).toByte
      raw(i * 2 + 1) = pcm.samples(i).toByte
      i += 1
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt,
      pcm.samples.length.toLong / pcm.channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    bos.toByteArray
  }

  // ------------------------------------------------------- animated GIF

  /** A decoded multi-frame sequence: composited full-canvas RGB frames plus
    * each frame's display delay (ms). Animated GIF is the one genuinely
    * multi-frame "video" container the JVM decodes natively, so the video
    * frame-sampling path can be REAL end-to-end.
    */
  final case class FrameSeq(width: Int, height: Int,
      frames: Array[ImageRgb], delaysMs: Array[Int]) {
    def durationMs: Long = { var s = 0L; var i = 0
      while (i < delaysMs.length) { s += delaysMs(i); i += 1 }; s }
  }

  /** True when the payload is a GIF with more than one frame (i.e. our
    * "video" modality). Cheap full parse via ImageIO's frame count.
    */
  def gifFrameCount(bytes: Array[Byte]): Int = {
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) 0
      else { val r = readers.next(); try { r.setInput(in); r.getNumImages(true) } finally r.dispose() }
    } finally in.close()
  }

  /** Decode every frame of a (possibly animated) GIF, compositing partial
    * frames onto the running canvas at their declared offsets (disposal
    * "none" semantics — what our encoder and typical web GIFs use) and
    * reading per-frame delays from the GraphicControlExtension (stored in
    * centiseconds; 0 is normalized to 100 ms like browsers do).
    */
  def decodeGifFrames(bytes: Array[Byte]): FrameSeq = {
    import javax.imageio.ImageIO
    val in = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(in)
      require(readers.hasNext, "no GIF reader")
      val r = readers.next()
      try {
        r.setInput(in)
        val n = r.getNumImages(true)
        require(n > 0, "empty GIF")
        val first = r.read(0)
        // canvas from the logical screen (stream metadata) when present,
        // else the first frame's size
        var cw = first.getWidth; var ch = first.getHeight
        val sm = r.getStreamMetadata
        if (sm != null) {
          val tree = sm.getAsTree("javax_imageio_gif_stream_1.0")
        val kids = tree.getChildNodes
          var i = 0
          while (i < kids.getLength) {
            val k = kids.item(i)
            if (k.getNodeName == "LogicalScreenDescriptor") {
              val at = k.getAttributes
              cw = at.getNamedItem("logicalScreenWidth").getNodeValue.toInt
              ch = at.getNamedItem("logicalScreenHeight").getNodeValue.toInt
            }
            i += 1
          }
        }
        val canvas = new java.awt.image.BufferedImage(cw, ch,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        val frames = new Array[ImageRgb](n)
        val delays = new Array[Int](n)
        var f = 0
        while (f < n) {
          val img = if (f == 0) first else r.read(f)
          var ox = 0; var oy = 0; var delayCs = 10
          val md = r.getImageMetadata(f)
          if (md != null) {
            val tree = md.getAsTree("javax_imageio_gif_image_1.0")
            val kids = tree.getChildNodes
            var i = 0
            while (i < kids.getLength) {
              val k = kids.item(i)
              k.getNodeName match {
                case "ImageDescriptor" =>
                  val at = k.getAttributes
                  ox = at.getNamedItem("imageLeftPosition").getNodeValue.toInt
                  oy = at.getNamedItem("imageTopPosition").getNodeValue.toInt
                case "GraphicControlExtension" =>
                  delayCs = k.getAttributes.getNamedItem("delayTime").getNodeValue.toInt
                case _ =>
              }
              i += 1
            }
          }
          g.drawImage(img, ox, oy, null)
          val argb = canvas.getRGB(0, 0, cw, ch, null, 0, cw)
          val rgb = new Array[Byte](cw * ch * 3)
          var i = 0
          while (i < argb.length) {
            val p = argb(i)
            rgb(i * 3) = ((p >> 16) & 0xff).toByte
            rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
            rgb(i * 3 + 2) = (p & 0xff).toByte
            i += 1
          }
          frames(f) = ImageRgb(cw, ch, rgb)
          delays(f) = if (delayCs <= 0) 100 else delayCs * 10
          f += 1
        }
        g.dispose()
        FrameSeq(cw, ch, frames, delays)
      } finally r.dispose()
    } finally in.close()
  }

  /** Encode an animated GIF (one global delay, in ms — quantized to the
    * format's centisecond grid) through ImageIO's sequence writer, setting
    * each frame's GraphicControlExtension delay.
    */
  def encodeAnimatedGif(frames: Seq[ImageRgb], delayMs: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    require(frames.nonEmpty, "need at least one frame")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val out = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(out)
      val bi0 = toBuffered(frames.head)
      val typeSpec = ImageTypeSpecifier.createFromRenderedImage(bi0)
      writer.prepareWriteSequence(null)
      for (fr <- frames) {
        val bi = toBuffered(fr)
        val md = writer.getDefaultImageMetadata(typeSpec, writer.getDefaultWriteParam)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = {
          val kids = tree.getChildNodes
          var found: javax.imageio.metadata.IIOMetadataNode = null
          var i = 0
          while (i < kids.getLength) {
            if (kids.item(i).getNodeName == "GraphicControlExtension")
              found = kids.item(i).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            i += 1
          }
          if (found == null) {
            found = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
            tree.appendChild(found)
          }
          found
        }
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", math.max(1, delayMs / 10).toString)
        md.setFromTree(fmt, tree)
        writer.writeToSequence(new IIOImage(bi, null, md), writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  // -------------------------------------------------- AVI (MJPEG / DIB)

  /** JPEG encode with explicit quality (ImageIO's writer param) — MJPEG
    * frames use quality 1.0 so a constant-color frame round-trips within
    * ±1/channel (all-ones luminance quantization table; the residual is
    * YCbCr integer rounding).
    */
  def encodeJpeg(img: ImageRgb, quality: Float = 1.0f): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val out = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(out)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new IIOImage(toBuffered(img), null, null), p)
    } finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  /** Encode an MJPEG-in-AVI clip (the RIFF video container a JVM can fully
    * handle: per-frame JPEG payloads, no inter-frame codec): standard
    * RIFF('AVI ') layout — LIST hdrl (avih + one 'vids'/'MJPG' strl) +
    * LIST movi of '00dc' chunks + idx1. `frameMs` is the per-frame display
    * period (dwMicroSecPerFrame = frameMs·1000; dwScale/dwRate = frameMs/
    * 1000 — a proper ms-precision rational).
    */
  def encodeAviMjpeg(frames: Seq[ImageRgb], frameMs: Int,
      jpegQuality: Float = 1.0f): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val w = frames.head.width
    val h = frames.head.height
    val payloads = frames.map(f => encodeJpeg(f, jpegQuality))
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val maxPayload = payloads.map(_.length).max
    // chunk bodies are padded to even length per RIFF
    def padded(n: Int): Int = n + (n & 1)
    val moviBody = 4 + payloads.map(p => 8 + padded(p.length)).sum // 'movi' + chunks
    val idx1Body = 16 * payloads.length
    val hdrlBody = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40))) // 'hdrl' avih LIST strl
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody) + (8 + idx1Body)
    tag("RIFF"); w32(riffBody); tag("AVI ")
    // LIST hdrl
    tag("LIST"); w32(hdrlBody); tag("hdrl")
    tag("avih"); w32(56)
    w32(frameMs * 1000) // dwMicroSecPerFrame
    w32(0); w32(0); w32(0x10) // maxBytesPerSec, padding, flags=HASINDEX
    w32(payloads.length) // dwTotalFrames
    w32(0); w32(1); w32(maxPayload) // initialFrames, streams, suggestedBuf
    w32(w); w32(h)
    w32(0); w32(0); w32(0); w32(0) // reserved
    // LIST strl
    tag("LIST"); w32(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); w32(56)
    tag("vids"); tag("MJPG")
    w32(0); w16(0); w16(0); w32(0) // flags, priority, language, initialFrames
    w32(frameMs); w32(1000) // dwScale/dwRate: rate/scale = fps
    w32(0); w32(payloads.length) // start, length (frames)
    w32(maxPayload); w32(-1); w32(0) // bufSize, quality, sampleSize
    w16(0); w16(0); w16(w); w16(h) // rcFrame
    tag("strf"); w32(40)
    w32(40); w32(w); w32(h); w16(1); w16(24) // BITMAPINFOHEADER, planes, bpp
    tag("MJPG"); w32(w * h * 3)
    w32(0); w32(0); w32(0); w32(0) // ppm x/y, clrUsed, clrImportant
    // LIST movi (+ record chunk offsets relative to 'movi' fourcc for idx1)
    tag("LIST"); w32(moviBody); tag("movi")
    val offsets = new Array[Int](payloads.length)
    var off = 4 // idx1 offsets point past the 'movi' fourcc
    payloads.zipWithIndex.foreach { case (p, i) =>
      offsets(i) = off
      tag("00dc"); w32(p.length); bos.write(p)
      if ((p.length & 1) == 1) bos.write(0)
      off += 8 + padded(p.length)
    }
    tag("idx1"); w32(idx1Body)
    payloads.zipWithIndex.foreach { case (p, i) =>
      tag("00dc"); w32(0x10); w32(offsets(i)); w32(p.length) // AVIIF_KEYFRAME
    }
    bos.toByteArray
  }

  /** Decode an AVI clip: RIFF walk of hdrl (avih: frame period, counts,
    * canvas) and movi ('00dc'/'00db' chunks — JPEG payloads through the
    * JDK decoder; sub-LISTs 'rec ' are entered). Uniform per-frame delay
    * from dwMicroSecPerFrame (floor-ms, minimum 1).
    */
  def decodeAvi(bytes: Array[Byte]): FrameSeq = {
    require(bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'A' && bytes(9) == 'V' &&
      bytes(10) == 'I' && bytes(11) == ' ', "not an AVI")
    var frameMs = 40
    var cw = 0
    var ch = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[ImageRgb]
    // Chunk lengths come from the payload, so a malformed/hostile RIFF can
    // carry a negative or overlong len: reject len < 0 outright, clamp
    // every child walk and body read to the real buffer, and bail if the
    // cursor ever fails to strictly advance (corpus payloads reach this
    // walker via content sniffing — it must terminate on ANY byte string).
    def walk(from: Int, to: Int): Unit = {
      var i = from
      val end = math.min(to, bytes.length)
      while (i + 8 <= end) {
        val id = new String(bytes, i, 4, "US-ASCII")
        val len = le32(bytes, i + 4)
        require(len >= 0, s"negative RIFF chunk length $len at offset $i")
        val body = i + 8
        // Long arithmetic: body + len can wrap Int for hostile len values,
        // which would make the bounds checks below spuriously pass
        val bodyEnd = math.min(body.toLong + len, end.toLong).toInt
        id match {
          case "LIST" =>
            if (body + 4 <= bodyEnd) {
              val listType = new String(bytes, body, 4, "US-ASCII")
              if (listType == "hdrl" || listType == "movi" || listType == "rec " ||
                listType == "strl") walk(body + 4, bodyEnd)
            }
          case "avih" =>
            require(body + 40 <= bodyEnd, "truncated avih chunk")
            frameMs = math.max(1, le32(bytes, body) / 1000)
            cw = le32(bytes, body + 32)
            ch = le32(bytes, body + 36)
          case cc if cc.length == 4 && (cc.endsWith("dc") || cc.endsWith("db")) =>
            if (len > 0 && body.toLong + len <= end)
              frames += decodeJavax(java.util.Arrays.copyOfRange(bytes, body, body + len))
          case _ => // strh/strf/idx1/JUNK: not needed for decode
        }
        val nextL = body.toLong + len + (len & 1)
        require(nextL > i, s"RIFF cursor failed to advance at offset $i")
        i = math.min(nextL, end.toLong).toInt
      }
    }
    walk(12, math.min(bytes.length, 8 + le32(bytes, 4)))
    require(frames.nonEmpty, "AVI with no video frames")
    if (cw == 0) { cw = frames.head.width; ch = frames.head.height }
    FrameSeq(cw, ch, frames.toArray, Array.fill(frames.length)(frameMs))
  }

  private def toBuffered(img: ImageRgb): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val argb = new Array[Int](img.width * img.height)
    var i = 0
    while (i < argb.length) {
      argb(i) = ((img.rgb(i * 3) & 0xff) << 16) | ((img.rgb(i * 3 + 1) & 0xff) << 8) |
        (img.rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    bi.setRGB(0, 0, img.width, img.height, argb, 0, img.width)
    bi
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
