package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Similarity => Sim}

/** Online embedding-admission gate — the STREAMING counterpart of the
  * batch near-dup surface (q65 `dedupByEmbedding` / SemDeDup): vectors
  * arrive continuously (a live ingest feed) and each must be admitted or
  * rejected NOW, against (a) everything that already arrived and (b) a
  * FROZEN reference index (the previously-released corpus) — the
  * ingestion-time novelty check a 100 TB pipeline runs so a new crawl
  * snapshot doesn't re-admit what the last release already contains.
  *
  * One code path serves batch and stream (the [[PreferenceStream]]
  * discipline — shared projections cannot drift):
  *
  *  - **exact-arrival dedup** keys on the raw embedding value: batch =
  *    [[graft.ops.Dedup.dedupExact]] min-id survivor (deterministic,
  *    oracle-replayable); stream = state-store `dropDuplicates` on the
  *    vector (first-arrival survivor — identical when arrival order is id
  *    order, the spec setup; same survivor count always). With
  *    `eventTime` set, state is watermark-bounded
  *    (`dropDuplicatesWithinWatermark`) — the unbounded-feed mode.
  *  - **near-dup rejection vs the reference** is STATELESS per row: the
  *    arrival's sign-LSH bucket ([[Sim.signBucket]]) equi-joins the
  *    bucketed reference and any same-bucket neighbor with native cosine
  *    ≥ `minCosine` kills the row (stream-static LEFT ANTI join — Spark
  *    re-plans the static side per microbatch, so a re-published
  *    reference is picked up without restarting the query).
  *
  * What this deliberately does NOT do: near-dup detection WITHIN the
  * arrival stream (two novel-but-mutually-similar arrivals both admit) —
  * that requires per-bucket vector state and is the batch pass's job
  * (q65/q143/q158 run on the admitted corpus between releases). The
  * online gate's contract is exact-arrival dedup + novelty vs the frozen
  * index, which is what keeps its state one row per DISTINCT vector and
  * nothing per reference row.
  *
  * Scale shape: the dedup exchange hashes on the vector value (uniform —
  * no hot key can form unless the same vector floods, which is exactly
  * what the state kills); the anti join hashes on the bucket with the
  * reference SHUFFLED once per microbatch (broadcast when serving-sized —
  * leave the hint to stats/AQE); `bits` sizes bucket occupancy against
  * the reference density exactly as in [[Sim.bucketedPairs]]. */
object EmbedStream {

  /** EVOLVING-index vector admission — closes [[gate]]'s documented
    * non-goal (near-dup detection WITHIN the arrival stream) exactly as
    * [[TextStream.evolvingGate]] closes corpusGate's: every admitted
    * vector's `(bucket, vec)` row joins the index itself, so a scaled or
    * perturbed copy arriving microbatches later dies against everything
    * admitted so far, not just the frozen reference. Same mechanics —
    * one `foreachBatch` per trigger reading every parquet increment
    * STRICTLY below its own batchId (replay-idempotent, exactly-once;
    * seed increments carry non-numeric tags), admitting via
    * [[graft.ops.Dedup.admitStepEmbed]] (ONE code path with the batch
    * twin [[graft.ops.Dedup.admitWavesEmbed]]), writing admitted rows to
    * `admittedDir/batch=<id>` and their index rows to the new increment.
    * State = one (bucket, vec) row per admitted vector, on disk. The
    * arrivals must expose `vec_id` and `embedding` (the [[gate]]
    * contract). */
  def evolvingGate(arrivals: DataFrame, indexDir: String,
      admittedDir: String, checkpointDir: String, bits: Int,
      minCosine: Double): org.apache.spark.sql.streaming.StreamingQuery = {
    require(arrivals.isStreaming, "evolvingGate expects a streaming frame")
    val step: (DataFrame, Long) => Unit = (batch, batchId) => {
      val spark = batch.sparkSession
      val idx = readIndexBelow(spark, indexDir, batchId)
      val adm = graft.ops.Dedup.admitStepEmbed(batch, col("vec_id"),
          col("embedding"), idx, bits, minCosine)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      adm.write.mode("overwrite").parquet(s"$admittedDir/batch=$batchId")
      graft.ops.Dedup.embedIndexOf(adm, col("embedding"), bits)
        .write.mode("overwrite").parquet(s"$indexDir/inc=$batchId")
      adm.unpersist(false)
      ()
    }
    arrivals.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(step)
      .start()
  }

  /** COMPACT this gate's index increments — the `inc=` layout is shared
    * with the text gate, so this is [[TextStream.compactIndex]] verbatim
    * (duplicate (bucket, vec) rows kill identically; crash safety via
    * the same [[IncrementStore]] transaction). The r16 verdict's gap:
    * without this, a long-running embed gate reads one directory per
    * trigger forever. Same contract: `upToBatchId` ≤ last COMMITTED
    * batch, nondecreasing across calls. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatchId: Long): Int =
    TextStream.compactIndex(spark, indexDir, upToBatchId)

  /** Committed increments visible to `batchId` (the
    * [[TextStream]] rule): seeds plus numeric increments strictly below
    * it; empty-schema frame on a cold start. */
  private def readIndexBelow(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batchId: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val incs =
      if (!fs.exists(path)) Seq.empty[String]
      else fs.listStatus(path).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("inc="))
        .filter { s =>
          val tag = s.getPath.getName.stripPrefix("inc=")
          tag.toLongOption.forall(_ < batchId)
        }
        .map(_.getPath.toString).sorted
    if (incs.isEmpty)
      spark.range(0).select(col("id").as("bucket"),
        array().cast("array<float>").as("vec"))
    else spark.read.parquet(incs: _*)
  }

  /** Admit `arrivals` (`vec_id`, `embedding`) against the frozen
    * `reference` (an `embedding` column). Returns the admitted rows. */
  def gate(arrivals: DataFrame, reference: DataFrame, bits: Int,
      minCosine: Double,
      eventTime: Option[(Column, String)] = None): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    val refB = reference.select(
      Sim.signBucket(col("embedding"), bits).as("__rbucket"),
      col("embedding").as("__rvec"))
    val deduped =
      if (!arrivals.isStreaming)
        graft.ops.Dedup.dedupExact(arrivals, col("embedding"), col("vec_id"))
      else eventTime match {
        case Some((ts, delay)) =>
          arrivals.withColumn("__ts", ts).withWatermark("__ts", delay)
            .dropDuplicatesWithinWatermark("embedding").drop("__ts")
        case None => arrivals.dropDuplicates("embedding")
      }
    deduped
      .withColumn("__bucket", Sim.signBucket(col("embedding"), bits))
      .join(refB,
        col("__bucket") === col("__rbucket") &&
          Sim.cosineNative(arrivals, col("embedding"), col("__rvec"))
            >= minCosine,
        "left_anti")
      .drop("__bucket")
  }
}
