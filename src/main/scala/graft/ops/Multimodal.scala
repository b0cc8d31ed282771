package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: images/audio/video ride through the pipeline as
  * opaque `binary` columns with typed metadata structs. The Spark-side
  * plumbing — schemas, partition-parallel decode, bounded-memory batch
  * iteration, frame sampling — is real and tested. The codec step is REAL
  * for every common web image format (JPEG/PNG/GIF/TIFF via the JDK's own
  * ImageIO plugins; PPM/BMP via hand-rolled pure-JVM decoders), for
  * WAV/AIFF audio (RIFF walk resp. javax.sound), and for TWO video
  * containers — animated GIF and MJPEG-in-AVI (RIFF walk + per-frame JDK
  * JPEG decode) — see [[MediaCodec]] — including perceptual hashing
  * (dHash) for image near-dup. Only payloads in formats whose codecs the
  * JVM genuinely lacks (H.264-class inter-frame video) fall back to the
  * deterministic `FakeCodec` stub — swapping in a real codec there is
  * replacing one pure function inside the `mapPartitions`.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(
      doc_id: Long,
      kind: String, // image | audio | video
      byteLen: Long,
      width: Int,
      height: Int,
      durationMs: Long,
      digest: String)

  final case class Frame(doc_id: Long, frameIdx: Int, ts_ms: Long, pixels: Array[Byte])

  /** STUB codec — deterministic fake "decode" deriving plausible metadata
    * and frame bytes from the payload contents alone. Replace with a real
    * decoder (??? marks the seam).
    */
  object FakeCodec {
    private val kinds = Array("image", "audio", "video")
    def sniffKind(bytes: Array[Byte]): String =
      if (bytes.isEmpty) "image" else kinds((bytes(0) & 0xff) % 3)

    def decodeMeta(bytes: Array[Byte]): (Int, Int, Long) = {
      // real impl: ??? (e.g. javax.imageio / ffmpeg bindings)
      val h = java.util.Arrays.hashCode(bytes)
      (320 + math.abs(h % 1280), 240 + math.abs((h >> 8) % 720),
        1000L + math.abs((h >> 16) % 60000))
    }

    /** Deterministic fake frame bytes (a real decoder returns RGB planes). */
    def sampleFrame(bytes: Array[Byte], frameIdx: Int, size: Int = 64): Array[Byte] = {
      val out = new Array[Byte](size)
      var i = 0
      while (i < size) {
        out(i) = (bytes((frameIdx * 31 + i * 7) % math.max(bytes.length, 1)) ^ frameIdx).toByte
        i += 1
      }
      out
    }
  }

  /** Attach a binary media column (here: derived from text — stands in for a
    * real WARC payload column).
    */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.withColumn("media", encode(col("text"), "UTF-8"))

  /** Partition-parallel metadata extraction. The decode runs inside
    * `mapPartitions` so a real codec amortizes per-task init (dictionary,
    * native context) across the partition — the pattern that matters at
    * scale; rows stream through, nothing is collected.
    */
  def extractMeta(spark: SparkSession, docsWithMedia: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docsWithMedia.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-task codec init (amortized across the partition) would go here
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          md.reset()
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          MediaCodec.sniff(bytes) match {
            case Some("image/gif") =>
              // one parse decides: animated GIF = the REAL video modality
              // (canvas dims + summed frame delays, decoded by the JDK's own
              // GIF plugin); single-frame stays an image
              val seq = MediaCodec.decodeGifFrames(bytes)
              if (seq.frames.length > 1)
                MediaMeta(id, "video", bytes.length.toLong, seq.width, seq.height,
                  seq.durationMs, digest)
              else
                MediaMeta(id, "image", bytes.length.toLong, seq.width, seq.height, 0L, digest)
            case Some(m) if MediaCodec.isImage(m) =>
              val img = MediaCodec.decodeImage(bytes)
              MediaMeta(id, "image", bytes.length.toLong, img.width, img.height, 0L, digest)
            case Some("audio/wav") =>
              val pcm = MediaCodec.decodeWav(bytes)
              MediaMeta(id, "audio", bytes.length.toLong, 0, 0, pcm.durationMs, digest)
            case Some("audio/aiff") =>
              val pcm = MediaCodec.decodeJavaxAudio(bytes)
              MediaMeta(id, "audio", bytes.length.toLong, 0, 0, pcm.durationMs, digest)
            case Some("video/avi") =>
              // REAL video container #2: MJPEG-in-AVI (RIFF walk + the JDK
              // JPEG decoder per frame)
              val seq = MediaCodec.decodeAvi(bytes)
              MediaMeta(id, "video", bytes.length.toLong, seq.width, seq.height,
                seq.durationMs, digest)
            case _ => // container-absent codec (e.g. H.264 video): deterministic stub
              val kind = FakeCodec.sniffKind(bytes)
              val (w, h, dur) = FakeCodec.decodeMeta(bytes)
              MediaMeta(id, kind, bytes.length.toLong, w, h, dur, digest)
          }
        }
      }
  }

  /** Perceptual image hashes (64-bit dHash over the REAL decode) — the
    * image-near-dup map pass: identical/near-identical images collide or
    * land within small hamming distance; group or band-join downstream
    * exactly like SimHash. Non-image payloads yield no row.
    */
  def imageHashes(spark: SparkSession, docsWithMedia: DataFrame): DataFrame = {
    import spark.implicits._
    docsWithMedia.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaCodec.sniff(bytes) match {
            case Some(m) if MediaCodec.isImage(m) =>
              Some((id, MediaCodec.dHash(MediaCodec.decodeImage(bytes))))
            case _ => None
          }
        }
      }.toDF("doc_id", "dhash")
  }

  /** Per-window RMS audio energy over the REAL WAV decode — the silence /
    * loudness feature pass. One row per audio doc: window count plus the
    * first window's RMS (all windows of a stationary signal agree; callers
    * wanting the full profile explode `MediaCodec.rmsWindows` instead).
    * Non-audio payloads yield no row.
    */
  def audioEnergy(spark: SparkSession, docsWithMedia: DataFrame,
      windowMs: Int = 100): DataFrame = {
    import spark.implicits._
    docsWithMedia.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaCodec.sniff(bytes) match {
            case Some("audio/wav") =>
              val rms = MediaCodec.rmsWindows(MediaCodec.decodeWav(bytes), windowMs)
              Some((id, rms.length.toLong, if (rms.isEmpty) 0.0 else rms(0)))
            case Some("audio/aiff") =>
              val rms = MediaCodec.rmsWindows(MediaCodec.decodeJavaxAudio(bytes), windowMs)
              Some((id, rms.length.toLong, if (rms.isEmpty) 0.0 else rms(0)))
            case _ => None
          }
        }
      }.toDF("doc_id", "n_windows", "rms")
  }

  /** Frame sampling: one row per sampled frame, `everyMs`-spaced over the
    * clip, bounded by `maxFrames` per doc to keep rows/task predictable —
    * the explode-style fan-out a video pipeline needs. REAL for animated
    * GIF (the JVM's native multi-frame container) and for MJPEG-in-AVI
    * (RIFF walk + per-frame JDK JPEG decode): each sample timestamp picks
    * the frame on screen at that instant and emits its decoded RGB as a
    * bounded `thumbSize`×`thumbSize` nearest-resize thumbnail.
    * Container-absent codecs (H.264-class) fall back to the FakeCodec stub.
    */
  def sampleFrames(spark: SparkSession, docsWithMedia: DataFrame,
      everyMs: Long = 10000L, maxFrames: Int = 4, thumbSize: Int = 16): Dataset[Frame] = {
    import spark.implicits._
    docsWithMedia.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaCodec.sniff(bytes) match {
            case Some(m @ ("image/gif" | "video/avi")) =>
              // one parse: frames + delays (GIF via the JDK plugin, AVI via
              // the RIFF walk + per-frame JPEG decode)
              val seq =
                if (m == "image/gif") MediaCodec.decodeGifFrames(bytes)
                else MediaCodec.decodeAvi(bytes)
              val n = math.min(maxFrames.toLong,
                math.max(1L, (seq.durationMs + everyMs - 1) / everyMs)).toInt
              (0 until n).iterator.map { f =>
                val ts = f * everyMs
                // frame on screen at ts: first frame whose cumulative end > ts
                var idx = 0; var acc = 0L
                while (idx < seq.frames.length - 1 && acc + seq.delaysMs(idx) <= ts) {
                  acc += seq.delaysMs(idx); idx += 1
                }
                val thumb = MediaCodec.resizeNearest(seq.frames(idx), thumbSize, thumbSize)
                Frame(id, f, ts, thumb.rgb)
              }
            case _ =>
              val (_, _, dur) = FakeCodec.decodeMeta(bytes)
              val n = math.min(maxFrames, math.max(1, (dur / everyMs).toInt))
              (0 until n).iterator.map { f =>
                Frame(id, f, f * everyMs, FakeCodec.sampleFrame(bytes, f))
              }
          }
        }
      }
  }
}
