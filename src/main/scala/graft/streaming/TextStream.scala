package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Online TEXT-admission gate — the document twin of [[EmbedStream.gate]]
  * and the streaming counterpart of [[Dedup.dedupAgainstCorpus]] (q113):
  * documents arrive continuously and each must be admitted or rejected
  * NOW against (a) everything that already arrived and (b) the FROZEN
  * corpus's MinHash signature index — the ingestion-time novelty check
  * that keeps a new crawl snapshot from re-admitting what the last
  * release already contains, without ever touching the corpus TEXT
  * (the q158/q277 index-only contract).
  *
  * One code path serves batch and stream (the [[PreferenceStream]]
  * discipline — shared projections cannot drift):
  *
  *  - **within-arrival dedup** keys on the full row-wise MinHash
  *    signature ([[graft.functions.MinHashSignature]] — a stateless
  *    per-row projection, so it composes with state-store dedup on an
  *    append stream where an explode+groupBy signature could not).
  *    Batch = min-id survivor per signature ([[Dedup.dedupExact]],
  *    rerun-deterministic, oracle-replayable); stream = first-arrival
  *    survivor (state one row per distinct signature); with `eventTime`
  *    set, state is watermark-bounded (`dropDuplicatesWithinWatermark`)
  *    — the unbounded-feed mode. Null-text rows key per-id and are never
  *    collapsed. Texts with fewer than `n` tokens share the sentinel
  *    all-MaxValue signature and DO collapse — feed the gate tokenizable
  *    documents (a length floor is every curation pipeline's first rule).
  *  - **novelty vs the corpus** is STATELESS per row: one hash LEFT ANTI
  *    join per LSH band against the corpus index projected to that
  *    band's key — an arrival dies iff ANY band matches a corpus doc
  *    agreeing on ≥ ⌈t·k⌉ signature components (the integer agree-count
  *    verify, no cross-engine float boundary). Sequential per-band anti
  *    joins compose exactly dedupAgainstCorpus's "any candidate kills"
  *    rule while keeping every join an EQUI join — no OR-of-bands
  *    nested loop; Spark re-plans the static side per microbatch, so a
  *    re-published index is picked up without restarting the query.
  *
  * What this deliberately does NOT do: NEAR-dup detection within the
  * arrival stream beyond exact-signature collapse (two novel mutually
  * similar arrivals both admit) — that is the batch pass's job between
  * releases (q46/q113/q277), exactly [[EmbedStream.gate]]'s contract.
  *
  * Scale shape: the dedup exchange hashes on the signature string
  * (uniform); each band join hashes on the band key with the corpus
  * index — k longs per corpus doc — shuffled once per microbatch
  * (broadcast when serving-sized; leave the hint to stats/AQE). `bands`
  * bounds candidate fan-in exactly as in [[Dedup.lshBands]]. */
object TextStream {

  /** Admit `arrivals` (`doc_id`, `text`, …) against the frozen
    * `corpusIndex` (`doc`, `s0..s{k-1}` — any of the bit-equal signature
    * formulations, built at release-write time). Returns admitted rows
    * (original columns). */
  def corpusGate(arrivals: DataFrame, corpusIndex: DataFrame, n: Int,
      k: Int, bands: Int, minEstJaccard: Double,
      eventTime: Option[(Column, String)] = None): DataFrame = {
    require(bands > 0 && k % bands == 0,
      s"bands must divide k evenly (got k=$k, bands=$bands)")
    graft.GraftExtensions.ensureRegistered(arrivals.sparkSession)
    val minAgree = math.ceil(minEstJaccard * k - 1e-9).toInt
    val rows = k / bands
    val keyed = arrivals.withColumn("__sig",
      coalesce(
        call_function("minhash_signature", col("text"), lit(n), lit(k))
          .cast("string"),
        concat(lit("null-text:"), col("doc_id").cast("string"))))
    val deduped =
      if (!arrivals.isStreaming) Dedup.dedupExact(keyed, col("__sig"), col("doc_id"))
      else eventTime match {
        case Some((ts, delay)) =>
          keyed.withColumn("__ts", ts).withWatermark("__ts", delay)
            .dropDuplicatesWithinWatermark("__sig").drop("__ts")
        case None => keyed.dropDuplicates("__sig")
      }
    val withSig = deduped.withColumn("__asig",
      call_function("minhash_signature", col("text"), lit(n), lit(k)))
    val agree = (0 until k).map(j =>
      when(element_at(col("__asig"), j + 1) === col(s"__cs$j"), 1)
        .otherwise(0)).reduce(_ + _)
    val admitted = (0 until bands).foldLeft(withSig) { (acc, b) =>
      val ckey = concat_ws(",",
        (b * rows until (b + 1) * rows).map(j => col(s"s$j").cast("string")): _*)
      val idx = corpusIndex.select(
        (ckey.as("__ckey") +: (0 until k).map(j => col(s"s$j").as(s"__cs$j"))): _*)
      val akey = concat_ws(",",
        (b * rows until (b + 1) * rows)
          .map(j => element_at(col("__asig"), j + 1).cast("string")): _*)
      acc.join(idx, akey === col("__ckey") && agree >= minAgree, "left_anti")
    }
    admitted.drop("__sig", "__asig")
  }
}
