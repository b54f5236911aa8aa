package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, processed in batched per-partition passes.
  *
  * The IMAGE codec is real: JDK `javax.imageio` (headless) decodes
  * PNG/JPEG/BMP/GIF payloads to pixels, and `Graphics2D` resamples — zero
  * non-JDK dependencies ([[decodeImage]], [[imageStats]], [[resizeImage]]).
  * AUDIO and VIDEO remain clearly-marked deterministic STUBs
  * (`decodeStub`/`frameSliceStub`) because the JDK ships no audio/video
  * codec; the Iterator-based partition loop around them is the production
  * shape (it amortizes per-batch model or codec initialization exactly like
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

  /** STUB decoder for AUDIO/VIDEO — deterministic fake features derived from
    * payload bytes (the JDK ships no audio/video codec; ??? marks the seam).
    * Images have a REAL decoder below ([[decodeImage]]/[[decodeImageStats]]);
    * everything around this stub is the production partition loop. */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    // ??? real audio-frame / video-sample decode goes here (no JDK codec)
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
    * row. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      // per-partition codec/model initialization happens here, once
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val sum = digest.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, sum,
          decodeStub(r.payload, dim))
      }
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
