package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, processed in batched per-partition passes.
  *
  * The Spark-side plumbing — schema, partition sizing, batch iteration,
  * typed feature output — is real; the actual codec is a clearly-marked
  * deterministic STUB (`decodeStub`), because media libraries are not in
  * this environment. In production, swap `decodeStub` for a real decoder
  * (keeping the Iterator-based partition loop: it amortizes per-batch model
  * or codec initialization exactly like `mapInPandas`/`mapPartitions`
  * pipelines do, and never materializes a whole partition in memory).
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

  /** STUB decoder — deterministic fake features derived from payload bytes.
    * Replace with a real codec (??? marks the seam); everything around it is
    * the production partition loop. */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    // ??? real decode goes here (image resize / audio frames / video sample)
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

  /** STUB resize: truncate/pad the payload to `targetBytes` — stands in for
    * image resize (??? real resample goes here); the map-stage plumbing and
    * the metadata-preserving schema are the real part. */
  def resize(media: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    require(targetBytes > 0)
    media.map { r =>
      val out =
        if (r.payload.length >= targetBytes) r.payload.take(targetBytes)
        else r.payload ++ new Array[Byte](targetBytes - r.payload.length)
      r.copy(payload = out)
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
