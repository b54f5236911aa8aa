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
    * State = one (bucket, vec, doc) row per admitted vector, on disk —
    * the id rides along for [[forgetDocs]], never for admission. The
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
      graft.ops.Dedup.embedIndexOf(adm, col("vec_id"), col("embedding"), bits)
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

  /** FORGET vectors from the evolving embedding index by document id —
    * [[TextStream.forgetDocs]]'s twin, closing the r17 verdict's top
    * gap (the governance stack's one hole: a vector-side takedown used
    * to mean a full index rebuild, because the index rows carried no
    * id). One exhaustive [[IncrementStore]] compaction (`foldAll` —
    * raises instead of silently under-forgetting, the r17 ADVICE rule)
    * whose merge filters the removed `doc` ids; the index rows are
    * derived content and go with the document. A store still holding
    * PRE-r18 increments (the old `(bucket, vec)` layout, no `doc`
    * column) cannot be filtered by id — the call raises with the
    * migration path (rebuild the index from the admitted store via
    * [[graft.ops.Dedup.embedIndexOf]], which stamps ids) rather than
    * returning rows it cannot attribute. Same call contract as the text
    * twin: gate STOPPED, `upToBatchId` = last committed batch + 1. */
  def forgetDocs(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatchId: Long, ids: Seq[Long]): Int = {
    require(ids.nonEmpty, "forgetDocs: empty takedown list")
    // recovery FIRST (r18 ADVICE): a seed published by a crashed
    // compactor's roll-forward must be part of what the layout scan
    // checks, not invisible until the compact() call recovers it
    IncrementStore.recoverStore(spark, indexDir)
    // pre-scan EVERY increment's own schema (a multi-dir parquet read
    // samples ONE file's schema — a mixed old/new store could silently
    // drop `doc` and filter nothing); sources stay intact on the raise
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldLayout =
      if (!fs.exists(path)) Seq.empty[String]
      else fs.listStatus(path).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("inc="))
        .filter(s => !spark.read.parquet(s.getPath.toString)
          .columns.contains("doc"))
        .map(_.getPath.getName)
    if (oldLayout.nonEmpty)
      throw new graft.core.BadCallException(
        s"EmbedStream.forgetDocs: increments ${oldLayout.mkString(", ")} " +
          "hold the pre-r18 (bucket, vec) layout with no doc column — " +
          "ids cannot be attributed; rebuild the index from the admitted " +
          "store (Dedup.embedIndexOf stamps doc) and re-run the forget")
    // the shared body ALSO raises on null-doc ROWS — the laundering the
    // schema scan cannot see (a compaction that merged an old id-less
    // increment into a doc-carrying seed reads its rows as doc=NULL
    // with a passing schema; r18 ADVICE)
    IncrementStore.forgetDocIncrements(spark, indexDir, upToBatchId, ids,
      "EmbedStream.forgetDocs")
  }

  /** Committed increments visible to `batchId` (the
    * [[TextStream]] rule): seeds plus numeric increments strictly below
    * it; empty-schema frame on a cold start. Crash recovery runs first
    * (r17 ADVICE — the [[TextStream.readIndexBelow]] rationale). A
    * pre-r18 seed without the `doc` column is normalized with nulls so
    * unions against new increments line up (admission never reads the
    * id). */
  private def readIndexBelow(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batchId: Long): DataFrame = {
    IncrementStore.recoverStore(spark, indexDir)
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
        array().cast("array<float>").as("vec"),
        col("id").as("doc"))
    else {
      val read = spark.read.parquet(incs: _*)
      if (read.columns.contains("doc")) read
      else read.withColumn("doc", lit(null).cast("long"))
    }
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
