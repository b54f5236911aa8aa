package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, processed in batched per-partition passes.
  *
  * The IMAGE codec is real: JDK `javax.imageio` (headless) decodes
  * PNG/JPEG/BMP/GIF payloads to pixels, and `Graphics2D` resamples — zero
  * non-JDK dependencies ([[decodeImage]], [[imageStats]], [[resizeImage]]).
  * The AUDIO codec is real too: JDK `javax.sound.sampled` decodes WAV/AIFF/
  * AU PCM payloads to 16-bit samples ([[decodeAudio]], [[decodeAudioStats]]).
  * Only VIDEO remains a clearly-marked deterministic STUB
  * (`frameSliceStub`) because the JDK ships no video demuxer; the
  * Iterator-based partition loop around it is the production shape (it
  * amortizes per-batch model or codec initialization exactly like
  * `mapInPandas`/`mapPartitions` pipelines do, and never materializes a
  * whole partition in memory).
  *
  * Scale notes: binary payloads dominate row size, so pipelines should set
  * `spark.sql.files.maxPartitionBytes` down (e.g. 64 MB) for decode stages,
  * and push metadata-only filters BEFORE any decode (Catalyst prunes the
  * binary column entirely for rows the filter drops — verified via
  * ReadSchema in the scan).
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      meta_source: String)

  /** Extracted features: fixed-width vector + scalar stats. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      features: Array[Float])

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** STUB decoder for VIDEO — deterministic fake features derived from
    * payload bytes (the JDK ships no video codec; ??? marks the seam).
    * Images and audio have REAL decoders below ([[decodeImage]]/
    * [[decodeImageStats]], [[decodeAudio]]/[[decodeAudioStats]]);
    * everything around this stub is the production partition loop. */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    // ??? real video-sample decode goes here (no JDK codec)
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) = out(i % dim) + (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched per-partition feature extraction over a typed Dataset — the
    * `mapPartitions` shape that amortizes codec init per partition, not per
    * row. Decodable payloads get REAL features: images a dim-bucket
    * luminance histogram, audio dim equal-width mean-|amplitude| bands;
    * video and undecodable payloads fall back to the deterministic stub
    * (so the pipeline never drops a row for having exotic bytes). */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      // per-partition codec/model initialization happens here, once
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val sum = digest.digest(r.payload).map("%02x".format(_)).mkString
        val feats = r.kind match {
          case "image" => decodeImage(r.payload).map(imageHistogram(_, dim))
          case "audio" => decodeAudio(r.payload).map(p => audioBands(p._2, dim))
          case _       => None
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, sum,
          feats.getOrElse(decodeStub(r.payload, dim)))
      }
    }

  /** Normalized luminance histogram: fraction of pixels per of `dim` equal
    * brightness buckets (luminance = (r+g+b)/3, integer math). */
  def imageHistogram(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val lum = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        out(math.min(dim - 1, lum * dim / 256)) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    var i = 0
    while (i < dim) { out(i) /= n; i += 1 }
    out
  }

  /** Mean |amplitude| (normalized to [0,1]) over `dim` equal sample bands —
    * the classic cheap audio energy profile. */
  def audioBands(samples: Array[Short], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    val counts = new Array[Int](dim)
    var i = 0
    while (i < samples.length) {
      val b = math.min(dim - 1, (i.toLong * dim / samples.length).toInt)
      out(b) += math.abs(samples(i).toInt) / 32768f
      counts(b) += 1
      i += 1
    }
    var b = 0
    while (b < dim) { if (counts(b) > 0) out(b) /= counts(b); b += 1 }
    out
  }

  /** One sampled frame (or audio window) extracted from a media payload. */
  final case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  implicit val mediaFrameEnc: Encoder[MediaFrame] = Encoders.product[MediaFrame]

  /** STUB frame decoder: fixed-stride byte windows standing in for video
    * frame extraction / audio windowing. ??? real demux+decode goes here;
    * the surrounding one-to-many flatMap IS the production shape. */
  def frameSliceStub(payload: Array[Byte], idx: Int, frameLen: Int): Array[Byte] =
    payload.slice(idx * frameLen, math.min((idx + 1) * frameLen, payload.length))

  /** Frame sampling: every `stride`-th frame up to `maxFrames` per media row,
    * as a bounded one-to-many flatMap (the row explosion never exceeds
    * maxFrames × input rows, so stage output is predictable at 100 TB —
    * unbounded per-video explosion is the classic multimodal-pipeline OOM).
    * Frames inherit the partition of their media row: decode-then-aggregate
    * pipelines stay shuffle-free until the feature aggregation. */
  def sampleFrames(media: Dataset[MediaRecord], frameLen: Int = 64,
      stride: Int = 2, maxFrames: Int = 4): Dataset[MediaFrame] = {
    require(frameLen > 0 && stride > 0 && maxFrames > 0)
    media.flatMap { r =>
      val total = (r.payload.length + frameLen - 1) / frameLen
      (0 until total by stride).take(maxFrames).map(i =>
        MediaFrame(r.media_id, i, frameSliceStub(r.payload, i, frameLen)))
    }
  }

  /** Opaque-byte normalize: truncate/pad the payload to `targetBytes` — for
    * payloads with no decodable structure (fixed-width feature blobs). For
    * IMAGES use [[resizeImages]], the real pixel resample. */
  def resize(media: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    require(targetBytes > 0)
    media.map { r =>
      val out =
        if (r.payload.length >= targetBytes) r.payload.take(targetBytes)
        else r.payload ++ new Array[Byte](targetBytes - r.payload.length)
      r.copy(payload = out)
    }
  }

  // ---------------------------------------------------------------------
  // Real image codec (JDK-only: javax.imageio + java.awt headless)
  // ---------------------------------------------------------------------

  /** Decoded-image scalar stats. Channel sums are exact Longs (PNG RGB is
    * lossless), so aggregations over them are DuckDB-oracle-checkable. */
  final case class ImageStats(
      media_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  implicit val imageStatsEnc: Encoder[ImageStats] = Encoders.product[ImageStats]

  /** Headless AWT + no ImageIO tmp-file cache: executors must never touch
    * a display or spill per-call scratch files to disk. Initialized once
    * per JVM on first use of the codec object. */
  private lazy val imageIoReady: Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Decode an image payload (PNG/JPEG/BMP/GIF — whatever the JDK's ImageIO
    * registry recognizes) to a BufferedImage. None for unrecognized or
    * corrupt payloads — callers drop or quarantine, never throw, so one bad
    * blob can't fail a 100 TB stage. */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    imageIoReady
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }
  }

  /** Lossless PNG encode. */
  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    imageIoReady
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic solid-fill RGB PNG — the synthetic fixture generator for
    * specs and oracle queries (testdata ships no media files). Solid fill
    * makes decoded channel sums exactly `w*h*channel`, pinning that the
    * decoder reads real pixels. */
  def syntheticPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    encodePng(img)
  }

  /** Exact per-image pixel statistics from a decoded image. */
  def imageStats(mediaId: Long, img: java.awt.image.BufferedImage): ImageStats = {
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    ImageStats(mediaId, w, h, w.toLong * h, sr, sg, sb)
  }

  /** Decode image payloads → exact pixel stats, per-partition (codec init
    * amortized); undecodable payloads are dropped (flatMap), not fatal. */
  def decodeImageStats(media: Dataset[MediaRecord]): Dataset[ImageStats] =
    media.mapPartitions { rows =>
      imageIoReady // once per partition-task JVM entry
      rows.flatMap(r => decodeImage(r.payload).map(img => imageStats(r.media_id, img)))
    }

  /** Real image resample to exact target dims via Graphics2D (bilinear —
    * deterministic for a given JDK; solid fills are exact under any
    * interpolation). Returns a new BufferedImage, RGB. */
  def resizeImage(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
    require(w > 0 && h > 0)
    imageIoReady
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = out.createGraphics()
    try {
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, w, h, null)
    } finally g2.dispose()
    out
  }

  /** Dataset-level image resize: decode → resample to (w,h) → re-encode PNG.
    * Rows that don't decode pass through unchanged (quarantine-by-identity
    * keeps row counts stable for downstream joins). */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] =
    media.mapPartitions { rows =>
      imageIoReady
      rows.map { r =>
        decodeImage(r.payload) match {
          case Some(img) => r.copy(payload = encodePng(resizeImage(img, w, h)))
          case None      => r
        }
      }
    }

  // ---------------------------------------------------------------------
  // Real audio codec (JDK-only: javax.sound.sampled — WAV/AIFF/AU PCM)
  // ---------------------------------------------------------------------

  /** Decoded-audio scalar stats over raw PCM16 samples. Integer-exact, so
    * aggregations are DuckDB-oracle-checkable just like [[ImageStats]]. */
  final case class AudioStats(
      media_id: Long,
      n_samples: Long,
      channels: Int,
      sample_rate: Int,
      sum_abs: Long,
      max_abs: Int)

  implicit val audioStatsEnc: Encoder[AudioStats] = Encoders.product[AudioStats]

  /** Decode an audio payload (WAV/AIFF/AU with PCM content — the formats
    * the JDK's `javax.sound.sampled` registry ships) to interleaved signed
    * 16-bit samples. None for unrecognized/corrupt payloads — same
    * drop-don't-throw contract as [[decodeImage]]. Non-16-bit PCM content
    * is converted to 16-bit by the JDK's own converter, keeping the output
    * shape uniform. */
  def decodeAudio(payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Short])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      val src = in.getFormat
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, src.getSampleRate,
        16, src.getChannels, src.getChannels * 2, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(fmt, in)
      val bytes = pcm.readAllBytes()
      val out = new Array[Short](bytes.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        i += 1
      }
      Some((fmt, out))
    } catch { case _: Exception => None }
  }

  /** Deterministic mono PCM16 WAV fixture: sample i is
    * `((seed + 7*i) mod 2003) - 1001` — integer-exact, so an oracle
    * recomputes every decoded sample arithmetically (the audio twin of
    * [[syntheticPng]]'s solid fill). */
  def syntheticWav(nSamples: Int, seed: Int, sampleRate: Int = 8000): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    require(nSamples > 0)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = ((seed.toLong + 7L * i) % 2003L - 1001L).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate.toFloat,
      16, 1, 2, sampleRate.toFloat, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode audio payloads → exact PCM stats, per-partition; undecodable
    * payloads drop, like [[decodeImageStats]]. */
  def decodeAudioStats(media: Dataset[MediaRecord]): Dataset[AudioStats] =
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudio(r.payload).map { case (fmt, samples) =>
          var sumAbs = 0L; var maxAbs = 0; var i = 0
          while (i < samples.length) {
            val a = math.abs(samples(i).toInt)
            sumAbs += a; if (a > maxAbs) maxAbs = a
            i += 1
          }
          AudioStats(r.media_id, samples.length.toLong / fmt.getChannels,
            fmt.getChannels, fmt.getSampleRate.toInt, sumAbs, maxAbs)
        }
      }
    }

  /** Build a media table from any table with a string column (testdata has no
    * binary fixtures, so payloads are the UTF-8 bytes — the pipeline is
    * payload-agnostic). */
  def fromText(df: DataFrame, id: String, text: String, source: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(id).cast("long").as("media_id"),
        lit("image").as("kind"),
        col(text).cast("binary").as("payload"),
        col(source).as("meta_source"))
      .as[MediaRecord]
  }
}
