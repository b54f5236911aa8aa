package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, processed in batched per-partition passes.
  *
  * All three codecs are REAL, zero non-JDK dependencies:
  *  - IMAGE: JDK `javax.imageio` (headless) decodes PNG/JPEG/BMP/GIF
  *    payloads to pixels, `Graphics2D` resamples ([[decodeImage]],
  *    [[imageStats]], [[resizeImage]]).
  *  - AUDIO: JDK `javax.sound.sampled` decodes WAV/AIFF/AU PCM payloads to
  *    16-bit samples ([[decodeAudio]], [[decodeAudioStats]]).
  *  - VIDEO: a pure-JDK RIFF/AVI demuxer ([[demuxAvi]]) walks the container
  *    byte-exactly and decodes frames — uncompressed BI_RGB DIB frames
  *    (`00db`) pixel-exactly, MJPEG frames (`00dc`) through the same real
  *    ImageIO JPEG codec the image path uses. [[sampleVideoFrames]] is real
  *    frame extraction; [[decodeVideoStats]] is oracle-checkable.
  * Payloads with no decodable structure fall back to the deterministic
  * byte-level featurizer ([[decodeStub]]) / byte-window slicer
  * ([[frameSliceStub]]) so a pipeline never drops a row for exotic bytes.
  * The Iterator-based partition loop is the production shape throughout (it
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

  /** Fallback featurizer for OPAQUE payloads — deterministic byte-level
    * features for rows whose bytes none of the real codecs ([[decodeImage]],
    * [[decodeAudio]], [[demuxAvi]]) recognize, so the pipeline never drops
    * a row for having exotic bytes. */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
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
    * luminance histogram, audio dim equal-width mean-|amplitude| bands,
    * video the mean luminance histogram over up to 4 sampled frames;
    * undecodable payloads fall back to the deterministic byte-level stub
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
          case "video" => demuxAvi(r.payload).flatMap(videoHistogram(_, dim))
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

  /** Byte-window slicer for OPAQUE payloads: fixed-stride byte windows for
    * rows with no parseable container (fixed-width feature blobs, raw PCM
    * dumps). Real video frame extraction is [[sampleVideoFrames]] via the
    * RIFF/AVI demuxer; this is the structureless fallback. */
  def frameSliceStub(payload: Array[Byte], idx: Int, frameLen: Int): Array[Byte] =
    payload.slice(idx * frameLen, math.min((idx + 1) * frameLen, payload.length))

  /** Byte-window sampling: every `stride`-th window up to `maxFrames` per
    * media row, as a bounded one-to-many flatMap (the row explosion never
    * exceeds maxFrames × input rows, so stage output is predictable at
    * 100 TB — unbounded per-video explosion is the classic
    * multimodal-pipeline OOM). Windows inherit the partition of their media
    * row: decode-then-aggregate pipelines stay shuffle-free until the
    * feature aggregation. For real video containers use
    * [[sampleVideoFrames]] (same bounded-flatMap shape, real decoded
    * frames). */
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

  /** 64-bit difference hash (dHash) — the standard perceptual fingerprint
    * for image near-dup detection: area-average the luminance onto a 9×8
    * grid, then emit one bit per horizontal gradient (cell < right
    * neighbour). Re-encodes, format changes, mild rescales and global
    * color shifts move the hash by a few bits at most; Hamming distance ≤ k
    * over [[graft.ops.Dedup.hammingPairs]] is the image-dedup rule.
    *
    * Deterministic BY CONSTRUCTION: integer area-average over exact pixel
    * blocks with the integer ITU-R 601 luma (299r+587g+114b)/1000 — NOT
    * Graphics2D resampling, whose interpolation may vary across JDKs. The
    * hash is a dedup KEY; it must be bit-stable across environments.
    * Degenerate dims (width < 9 / height < 8) clamp each block to ≥ 1
    * source pixel, so tiny images hash deterministically too. Bit layout:
    * bit (y*8 + x) set ⇔ cell(x,y) < cell(x+1,y); a solid image hashes to
    * exactly 0L, a strictly increasing horizontal gradient to -1L
    * (all 64 bits) — the two literal anchors the oracle pins. */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val gw = 9; val gh = 8
    val cells = new Array[Long](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = math.min(gy * h / gh, h - 1)
      val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
      var gx = 0
      while (gx < gw) {
        val x0 = math.min(gx * w / gw, w - 1)
        val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            sum += (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
              114L * (p & 0xff)) / 1000L
            x += 1
          }
          y += 1
        }
        cells(gy * gw + gx) = sum / ((x1 - x0).toLong * (y1 - y0))
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var i = 0
    while (i < gh * (gw - 1)) {
      val y = i / (gw - 1); val x = i % (gw - 1)
      if (cells(y * gw + x) < cells(y * gw + x + 1)) hash |= 1L << i
      i += 1
    }
    hash
  }

  final case class ImageHash(media_id: Long, dhash: Long)
  implicit val imageHashEnc: Encoder[ImageHash] = Encoders.product[ImageHash]

  /** Decode → dHash per image, per-partition codec amortization; corrupt
    * payloads drop (never throw). Feed the result (renamed to
    * `(doc, simhash)`) to [[graft.ops.Dedup.hammingPairs]] for banded
    * near-dup mining, or group by the hash for exact perceptual buckets. */
  def imageDHashes(media: Dataset[MediaRecord]): Dataset[ImageHash] =
    media.mapPartitions { rows =>
      imageIoReady
      rows.flatMap(r => decodeImage(r.payload).map(img =>
        ImageHash(r.media_id, dHash64(img))))
    }

  /** One perceptual hash per media row, KIND-dispatched — the single hash
    * column the generalized media-dedup curation stage keys on:
    * image → [[dHash64]], video → first-frame [[dHash64]] (demux + decode
    * frame 0 only), audio → [[audioEnvelopeHash64]]. One pass,
    * per-partition codec amortization; corrupt payloads and unknown kinds
    * produce no row (the doc passes curation unhashed). The `kind` column
    * rides along because the three hash spaces are UNRELATED — a video
    * first-frame hash colliding with an audio envelope hash is
    * coincidence, so near-dup mining must never compare across kinds. */
  final case class MediaHash(media_id: Long, kind: String, phash: Long)
  implicit val mediaHashEnc: Encoder[MediaHash] = Encoders.product[MediaHash]

  def perceptualHashes(media: Dataset[MediaRecord]): Dataset[MediaHash] =
    media.mapPartitions { rows =>
      imageIoReady
      rows.flatMap { r =>
        (r.kind match {
          case "image" => decodeImage(r.payload).map(dHash64)
          case "video" =>
            demuxAvi(r.payload).flatMap(_.decodeFrame(0)).map(dHash64)
          case "audio" => decodeAudio(r.payload).map {
            case (_, samples) => audioEnvelopeHash64(samples) }
          case _ => None
        }).map(h => MediaHash(r.media_id, r.kind, h))
      }
    }

  /** Deterministic horizontal-gradient frame: luma rises strictly left to
    * right (column x is the gray value `lo + x*step`), so for w ≥ 9 its
    * dHash is exactly -1L — the all-bits anchor fixture (image AND video
    * first-frame variants). */
  def gradientImage(w: Int, h: Int, lo: Int, step: Int): java.awt.image.BufferedImage = {
    require(w > 0 && h > 0 && step > 0 && lo + (w - 1) * step <= 255,
      s"gradient out of range: lo=$lo step=$step w=$w")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = lo + x * step
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** [[gradientImage]] as an encoded PNG. */
  def syntheticGradientPng(w: Int, h: Int, lo: Int, step: Int): Array[Byte] =
    encodePng(gradientImage(w, h, lo, step))

  /** Deterministic image whose [[dHash64]] is EXACTLY `bits` — the
    * generalized anchor fixture (solid = 0L and full gradient = -1L are
    * its two extremes): at 9×8 every dHash grid cell is one pixel, so
    * bit (y·8+x) is pinned by making pixel (x+1, y) strictly brighter
    * (bit set) or strictly darker (bit clear) than pixel (x, y), walking
    * gray values ±2 from 128 (range [112, 144], luma of gray v is
    * exactly v under the integer ITU-R 601 weights). Lets an oracle
    * replay a whole perceptual-near-dup pipeline as doc-id arithmetic:
    * plant hashes at chosen Hamming distances and the REAL
    * decode→hash path lands on them bit for bit. */
  def bitPatternImage(bits: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = 128
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      var x = 0
      while (x < 8) {
        v += (if (((bits >> (y * 8 + x)) & 1L) == 1L) 2 else -2)
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** [[bitPatternImage]] as an encoded PNG (lossless — the decoded hash
    * is exactly `bits`). */
  def syntheticBitPng(bits: Long): Array[Byte] =
    encodePng(bitPatternImage(bits))

  /** [[bitPatternImage]] as a one-frame lossless BI_RGB AVI — the VIDEO
    * twin: its first-frame dHash ([[perceptualHashes]]' video key) is
    * exactly `bits`. */
  def syntheticBitAvi(bits: Long): Array[Byte] =
    encodeAviRgb(Seq(bitPatternImage(bits)))

  /** First-frame perceptual hash per video: demux → decode frame 0 →
    * [[dHash64]]. The cheap video near-dup key — container re-muxes and
    * lossless re-encodes preserve frame content, so they land on the same
    * hash; feed [[graft.ops.Dedup.hammingPairs]] for tolerance. Only frame
    * 0 ever decodes (lazy chunk decode): peak memory is one frame, and the
    * demux itself never copies the frame payloads. */
  def videoDHashes(media: Dataset[MediaRecord]): Dataset[ImageHash] =
    media.mapPartitions { rows =>
      imageIoReady
      rows.flatMap(r => demuxAvi(r.payload).flatMap(_.decodeFrame(0))
        .map(img => ImageHash(r.media_id, dHash64(img))))
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

  /** 64-bit audio envelope hash — [[dHash64]]'s audio twin: mean |sample|
    * over 65 equal windows, one bit per RISING envelope step (window i <
    * window i+1). Start-offset trims, lossless re-encodes and moderate
    * uniform gain keep the loudness CONTOUR, so near-dup takes land within
    * a few bits — Hamming over [[graft.ops.Dedup.hammingPairs]] is the
    * audio-dedup rule, exactly as for images. Integer arithmetic only
    * (sums and floor means of int16 magnitudes): the hash is a dedup key
    * and must be bit-stable across JVMs/platforms. Short clips clamp each
    * window to ≥ 1 sample. Anchors: a constant-amplitude clip hashes to
    * exactly 0L, a strictly rising envelope to -1L. */
  def audioEnvelopeHash64(samples: Array[Short]): Long = {
    require(samples.nonEmpty, "envelope hash needs at least one sample")
    val nw = 65
    val n = samples.length
    val env = new Array[Long](nw)
    var i = 0
    while (i < nw) {
      val s0 = math.min(i * n / nw, n - 1)
      val s1 = math.max(s0 + 1, (i + 1) * n / nw)
      var sum = 0L
      var j = s0
      while (j < s1) { sum += math.abs(samples(j).toLong); j += 1 }
      env(i) = sum / (s1 - s0)
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (env(i) < env(i + 1)) hash |= 1L << i
      i += 1
    }
    hash
  }

  final case class AudioHash(media_id: Long, ehash: Long)
  implicit val audioHashEnc: Encoder[AudioHash] = Encoders.product[AudioHash]

  /** Decode → envelope hash per clip, per-partition; corrupt payloads
    * drop. Rename to `(doc, simhash)` for [[graft.ops.Dedup.hammingPairs]]. */
  def audioEnvelopeHashes(media: Dataset[MediaRecord]): Dataset[AudioHash] =
    media.mapPartitions(rows =>
      rows.flatMap(r => decodeAudio(r.payload).map { case (_, samples) =>
        AudioHash(r.media_id, audioEnvelopeHash64(samples)) }))

  /** Deterministic envelope WAV: sample i alternates sign with amplitude
    * `lo + i*slope` — envelope strictly rising for slope > 0 (hash −1L),
    * constant for slope = 0 (hash 0L). The audio anchor fixture. */
  def syntheticEnvelopeWav(nSamples: Int, lo: Int, slope: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    require(nSamples > 0 && lo >= 0 && slope >= 0 &&
      lo.toLong + nSamples.toLong * slope <= 32767L,
      s"envelope out of int16 range: lo=$lo slope=$slope n=$nSamples")
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val a = lo + i * slope
      val v = (if (i % 2 == 0) a else -a).toShort
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

  // ---------------------------------------------------------------------
  // Real video codec (JDK-only: RIFF/AVI container demux; BI_RGB frames
  // decoded byte-exactly, MJPEG frames through the real ImageIO JPEG codec)
  // ---------------------------------------------------------------------

  /** A demuxed AVI: stream geometry + the raw per-frame chunk payloads.
    * Frame DECODE is deferred to [[DemuxedVideo.decodeFrame]] so stride
    * sampling never pays for skipped frames (demux is an O(bytes) container
    * walk; decode is the expensive part). `codec` is `"rgb"` (uncompressed
    * BI_RGB DIB, decoded byte-exactly) or `"mjpg"` (per-frame JPEG via
    * ImageIO). `topDown` mirrors the DIB convention: negative biHeight
    * means rows are stored top-down instead of the default bottom-up. */
  final case class DemuxedVideo(
      width: Int,
      height: Int,
      codec: String,
      topDown: Boolean,
      bitCount: Int,
      frameChunks: IndexedSeq[Array[Byte]]) {
    def nFrames: Int = frameChunks.length
    // drop-don't-throw here too: demux validates the container geometry,
    // but a frame CHUNK can still be malformed (truncated DIB, bogus JPEG
    // markers) and this runs outside demuxAvi's catch — one corrupt blob
    // must not fail a whole decode stage
    def decodeFrame(i: Int): Option[java.awt.image.BufferedImage] = try {
      codec match {
        case "rgb"  => decodeDib(frameChunks(i), width, height, bitCount, topDown)
        case "mjpg" => decodeImage(frameChunks(i))
        case _      => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def fourCC(b: Array[Byte], o: Int): String =
    if (o + 4 > b.length) ""
    else new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Demux a RIFF/AVI payload: walk `hdrl` for the first `vids` stream's
    * BITMAPINFOHEADER (width / height / bit depth / compression), then
    * collect that stream's frame chunks (`NNdb` uncompressed / `NNdc`
    * compressed, including inside nested `rec ` LISTs) from `movi`.
    * Supported frame codings: BI_RGB 24/32-bit DIB and MJPEG. None for
    * anything unrecognized or corrupt — same drop-don't-throw contract as
    * [[decodeImage]]/[[decodeAudio]], so one bad blob can't fail a 100 TB
    * stage. */
  def demuxAvi(payload: Array[Byte]): Option[DemuxedVideo] = try {
    if (payload.length < 12 || fourCC(payload, 0) != "RIFF" ||
      fourCC(payload, 8) != "AVI ") return None
    val end = math.min(payload.length.toLong, 8L + u32(payload, 4))

    var width = 0; var height = 0; var bitCount = 0
    var topDown = false; var codec = ""
    var vidsStream = -1 // index of the first 'vids' stream, in strl order
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    // one pass over hdrl to bind the stream, then one over movi for frames;
    // chunk grammar: id(4) size(4) data(size) pad(size&1)
    def walkHdrl(from: Long, to: Long): Unit = {
      var o = from
      var streamIdx = -1
      while (o + 8 <= to) {
        val id = fourCC(payload, o.toInt)
        val size = u32(payload, o.toInt + 4)
        val data = o + 8
        if (id == "LIST" && fourCC(payload, data.toInt) == "strl") {
          streamIdx += 1
          // within strl: strh tells the stream type, strf carries the
          // BITMAPINFOHEADER for video streams
          var so = data + 4
          val sEnd = math.min(to, data + size)
          var isVids = false
          while (so + 8 <= sEnd) {
            val sid = fourCC(payload, so.toInt)
            val ssize = u32(payload, so.toInt + 4)
            val sdata = (so + 8).toInt
            if (sid == "strh" && ssize >= 8)
              isVids = fourCC(payload, sdata) == "vids"
            if (sid == "strf" && isVids && vidsStream < 0 && ssize >= 40) {
              vidsStream = streamIdx
              width = i32(payload, sdata + 4)
              val rawH = i32(payload, sdata + 8)
              topDown = rawH < 0
              height = math.abs(rawH)
              bitCount = u16(payload, sdata + 14)
              val comp = u32(payload, sdata + 16)
              codec =
                if (comp == 0L && (bitCount == 24 || bitCount == 32)) "rgb"
                else if (comp == MJPG_FOURCC || fourCC(payload, sdata + 16) == "MJPG") "mjpg"
                else ""
            }
            so += 8 + ssize + (ssize & 1)
          }
        }
        o = data + size + (size & 1)
      }
    }

    def walkMovi(from: Long, to: Long): Unit = {
      val want = f"$vidsStream%02d"
      var o = from
      while (o + 8 <= to) {
        val id = fourCC(payload, o.toInt)
        val size = u32(payload, o.toInt + 4)
        val data = o + 8
        if (id == "LIST" && fourCC(payload, data.toInt) == "rec ")
          walkMovi(data + 4, math.min(to, data + size))
        else if (id.startsWith(want) &&
          (id.endsWith("db") || id.endsWith("dc")) && data + size <= to)
          frames += java.util.Arrays.copyOfRange(
            payload, data.toInt, (data + size).toInt)
        o = data + size + (size & 1)
      }
    }

    // top level: LIST hdrl, LIST movi (idx1 and anything else is skipped —
    // the index is an optimization for seeking, not needed for a full walk)
    var o = 12L
    while (o + 8 <= end) {
      val id = fourCC(payload, o.toInt)
      val size = u32(payload, o.toInt + 4)
      val data = o + 8
      if (id == "LIST") fourCC(payload, data.toInt) match {
        case "hdrl" => walkHdrl(data + 4, math.min(end, data + size))
        case "movi" if vidsStream >= 0 && codec.nonEmpty =>
          walkMovi(data + 4, math.min(end, data + size))
        case _ => ()
      }
      o = data + size + (size & 1)
    }

    // sanity-bound declared dimensions: a corrupt header can claim widths
    // near Int.MaxValue, which would overflow Int row-stride math and OOM
    // the frame allocation downstream; no real AVI exceeds 32768 on an axis
    if (vidsStream < 0 || codec.isEmpty ||
      width < 1 || width > 32768 || height < 1 || height > 32768 ||
      frames.isEmpty) None
    else Some(DemuxedVideo(width, height, codec, topDown, bitCount, frames.toIndexedSeq))
  } catch { case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  private val MJPG_FOURCC: Long = u32("MJPG".getBytes("US-ASCII"), 0)

  /** Decode one uncompressed DIB frame chunk (BI_RGB, 24- or 32-bit,
    * bottom-up unless `topDown`, rows padded to 4-byte boundaries) to a
    * BufferedImage — byte-exact, no resampling, no color conversion. */
  def decodeDib(data: Array[Byte], w: Int, h: Int, bitCount: Int,
      topDown: Boolean): Option[java.awt.image.BufferedImage] = {
    val bpp = bitCount / 8
    if (bpp != 3 && bpp != 4) return None
    if (w < 1 || w > 32768 || h < 1 || h > 32768) return None
    // stride in Long: w*bpp can overflow Int for hostile declared widths,
    // which would bypass the length guard below with a small/negative value
    val rowLenL = ((w.toLong * bpp + 3) / 4) * 4
    if (data.length < rowLenL * h) return None
    val rowLen = rowLenL.toInt // <= 4*32768+3, safe after the bounds check
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      var o = srcRow * rowLen
      while (x < w) {
        // DIB pixel order is B,G,R(,X)
        val bch = data(o) & 0xff; val gch = data(o + 1) & 0xff; val rch = data(o + 2) & 0xff
        img.setRGB(x, y, (rch << 16) | (gch << 8) | bch)
        x += 1; o += bpp
      }
      y += 1
    }
    Some(img)
  }

  private def putFourCC(bos: java.io.ByteArrayOutputStream, s: String): Unit =
    bos.write(s.getBytes("US-ASCII"), 0, 4)

  private def putU32(bos: java.io.ByteArrayOutputStream, v: Long): Unit = {
    bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
    bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
  }

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length + 9)
    putFourCC(bos, id); putU32(bos, data.length.toLong)
    bos.write(data, 0, data.length)
    if ((data.length & 1) == 1) bos.write(0) // RIFF chunks are even-aligned
    bos.toByteArray
  }

  private def list(listType: String, children: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(children.length + 13)
    putFourCC(bos, "LIST"); putU32(bos, children.length + 4L)
    putFourCC(bos, listType)
    bos.write(children, 0, children.length)
    bos.toByteArray
  }

  /** Assemble a complete single-video-stream AVI container around
    * ready-made frame chunks. `compression` 0 = BI_RGB (`00db` chunks),
    * MJPG fourcc = MJPEG (`00dc`). Writes avih + strh/strf + movi + idx1 —
    * the full standard layout, so any AVI reader (not just [[demuxAvi]])
    * accepts the output. */
  private def buildAvi(w: Int, h: Int, bitCount: Int, compression: Long,
      frameData: Seq[Array[Byte]], fps: Int): Array[Byte] = {
    val db = compression == 0L
    val frameId = if (db) "00db" else "00dc"
    val maxFrame = if (frameData.isEmpty) 0 else frameData.map(_.length).max

    val avih = new java.io.ByteArrayOutputStream(56)
    putU32(avih, 1000000L / fps)          // dwMicroSecPerFrame
    putU32(avih, maxFrame.toLong * fps)   // dwMaxBytesPerSec
    putU32(avih, 0); putU32(avih, 0x10)   // padding; AVIF_HASINDEX
    putU32(avih, frameData.length.toLong) // dwTotalFrames
    putU32(avih, 0); putU32(avih, 1)      // initial frames; 1 stream
    putU32(avih, maxFrame.toLong)         // suggested buffer
    putU32(avih, w.toLong); putU32(avih, h.toLong)
    (0 until 4).foreach(_ => putU32(avih, 0)) // dwReserved

    val strh = new java.io.ByteArrayOutputStream(56)
    putFourCC(strh, "vids")
    if (db) putFourCC(strh, "DIB ") else putFourCC(strh, "MJPG")
    putU32(strh, 0); putU32(strh, 0)      // flags; prio+language
    putU32(strh, 0)                       // initial frames
    putU32(strh, 1); putU32(strh, fps.toLong) // scale; rate
    putU32(strh, 0); putU32(strh, frameData.length.toLong) // start; length
    putU32(strh, maxFrame.toLong); putU32(strh, 0xffffffffL) // buffer; quality
    putU32(strh, 0)                       // sample size
    putU32(strh, 0); putU32(strh, (h.toLong << 16) | w.toLong) // rcFrame

    val strf = new java.io.ByteArrayOutputStream(40)
    putU32(strf, 40); putU32(strf, w.toLong); putU32(strf, h.toLong)
    putU32(strf, (bitCount.toLong << 16) | 1L) // biPlanes=1, biBitCount
    putU32(strf, compression)
    putU32(strf, frameData.headOption.map(_.length.toLong).getOrElse(0L))
    (0 until 4).foreach(_ => putU32(strf, 0)) // ppm x/y, clr used/important

    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
    val moviChildren = frameData.map(chunk(frameId, _))
    val movi = list("movi", moviChildren.flatten.toArray)

    val idx1 = new java.io.ByteArrayOutputStream(frameData.length * 16)
    var off = 4L // offsets are relative to the start of movi's list type
    frameData.foreach { f =>
      putFourCC(idx1, frameId); putU32(idx1, 0x10) // AVIIF_KEYFRAME
      putU32(idx1, off); putU32(idx1, f.length.toLong)
      off += 8 + f.length + (f.length & 1)
    }

    val body = hdrl ++ movi ++ chunk("idx1", idx1.toByteArray)
    val bos = new java.io.ByteArrayOutputStream(body.length + 12)
    putFourCC(bos, "RIFF"); putU32(bos, body.length + 4L); putFourCC(bos, "AVI ")
    bos.write(body, 0, body.length)
    bos.toByteArray
  }

  /** Serialize a BufferedImage as one bottom-up, 4-byte-row-padded 24-bit
    * BI_RGB DIB frame chunk (the exact bytes [[decodeDib]] reads back). */
  def encodeDib(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val rowLen = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](rowLen * h)
    var y = 0
    while (y < h) {
      var x = 0
      var o = (h - 1 - y) * rowLen
      while (x < w) {
        val p = img.getRGB(x, y)
        out(o) = (p & 0xff).toByte          // B
        out(o + 1) = ((p >> 8) & 0xff).toByte  // G
        out(o + 2) = ((p >> 16) & 0xff).toByte // R
        x += 1; o += 3
      }
      y += 1
    }
    out
  }

  /** Real uncompressed AVI from frames: 24-bit BI_RGB, lossless — decoded
    * stats are integer-exact, so video pipelines are DuckDB-oracle-checkable
    * exactly like [[syntheticPng]] images. */
  def encodeAviRgb(frames: Seq[java.awt.image.BufferedImage], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "avi: need at least one frame")
    val w = frames.head.getWidth; val h = frames.head.getHeight
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "avi: all frames must share dimensions")
    buildAvi(w, h, 24, 0L, frames.map(encodeDib), fps)
  }

  /** Real MJPEG AVI: each frame JPEG-encoded by ImageIO, wrapped in `00dc`
    * chunks with biCompression = 'MJPG' — the standard motion-JPEG layout. */
  def encodeAviMjpeg(frames: Seq[java.awt.image.BufferedImage], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "avi: need at least one frame")
    imageIoReady
    val w = frames.head.getWidth; val h = frames.head.getHeight
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "avi: all frames must share dimensions")
    val jpegs = frames.map { f =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(f, "jpg", bos)
      bos.toByteArray
    }
    buildAvi(w, h, 24, MJPG_FOURCC, jpegs, fps)
  }

  /** Deterministic solid-fill AVI fixture: frame f of `colors` is a solid
    * w×h fill — the video twin of [[syntheticPng]]. Lossless BI_RGB, so an
    * oracle recomputes every decoded channel sum arithmetically. */
  def syntheticAvi(w: Int, h: Int, colors: Seq[(Int, Int, Int)]): Array[Byte] =
    encodeAviRgb(colors.map { case (r, g, b) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      img
    })

  /** Decoded-video scalar stats: geometry + exact channel sums across ALL
    * frames. Integer-exact for BI_RGB content (lossless), so aggregations
    * are DuckDB-oracle-checkable like [[ImageStats]]/[[AudioStats]]. */
  final case class VideoStats(
      media_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      n_pixels: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  implicit val videoStatsEnc: Encoder[VideoStats] = Encoders.product[VideoStats]

  /** Demux + decode video payloads → exact per-video stats, per-partition
    * (codec init amortized); undecodable payloads drop (flatMap), not
    * fatal. Frames decode one at a time — peak memory is one frame, not
    * one video. */
  def decodeVideoStats(media: Dataset[MediaRecord]): Dataset[VideoStats] =
    media.mapPartitions { rows =>
      imageIoReady
      rows.flatMap { r =>
        demuxAvi(r.payload).map { v =>
          var sr = 0L; var sg = 0L; var sb = 0L; var np = 0L
          var i = 0
          while (i < v.nFrames) {
            v.decodeFrame(i).foreach { img =>
              val st = imageStats(r.media_id, img)
              sr += st.sum_r; sg += st.sum_g; sb += st.sum_b; np += st.n_pixels
            }
            i += 1
          }
          VideoStats(r.media_id, v.width, v.height, v.nFrames, np, sr, sg, sb)
        }
      }
    }

  /** REAL video frame sampling: demux the AVI container, decode every
    * `stride`-th frame up to `maxFrames`, and emit each as a lossless PNG
    * payload (so downstream image stages — [[decodeImageStats]],
    * [[resizeImages]], [[extractFeatures]] — consume frames unchanged).
    * Bounded one-to-many flatMap, same scale shape as [[sampleFrames]]:
    * row explosion ≤ maxFrames × input rows, frames stay in their media
    * row's partition, skipped frames are never decoded. Payloads that are
    * not AVI drop (flatMap) — use [[sampleFrames]] for opaque byte
    * windows. */
  def sampleVideoFrames(media: Dataset[MediaRecord], stride: Int = 2,
      maxFrames: Int = 4): Dataset[MediaFrame] = {
    require(stride > 0 && maxFrames > 0)
    media.flatMap { r =>
      demuxAvi(r.payload).toSeq.flatMap { v =>
        (0 until v.nFrames by stride).take(maxFrames).flatMap(i =>
          v.decodeFrame(i).map(img => MediaFrame(r.media_id, i, encodePng(img))))
      }
    }
  }

  /** Mean luminance histogram over up to `maxFrames` evenly-strided decoded
    * frames — the video featurizer behind [[extractFeatures]]. None if no
    * frame decodes. */
  def videoHistogram(v: DemuxedVideo, dim: Int, maxFrames: Int = 4): Option[Array[Float]] = {
    val stride = math.max(1, v.nFrames / maxFrames)
    val hists = (0 until v.nFrames by stride).take(maxFrames)
      .flatMap(i => v.decodeFrame(i).map(imageHistogram(_, dim)))
    if (hists.isEmpty) None
    else Some(Array.tabulate(dim)(i => hists.map(_(i)).sum / hists.length))
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
