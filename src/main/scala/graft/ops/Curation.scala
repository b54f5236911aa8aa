package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pipeline a training-data team
  * ships — quality filter → language rebalance → exact dedup → fuzzy dedup
  * → split assignment → chunking → context packing. Every stage is one of
  * the library's individually-tested operators; this facade fixes the
  * composition order and column threading, and q91 pins the WHOLE
  * composition against a single DuckDB oracle.
  *
  * Both dedup stages keep the MINIMUM id per key (deterministic), not
  * `dropDuplicates`' arbitrary row — an end-to-end pipeline must be
  * re-runnable to the byte, and an oracle can't reproduce an arbitrary
  * choice. Scale shape: every stage is a map stage, a hash-partitioned
  * window, or a broadcast-joinable projection; nothing quadratic, nothing
  * driver-side. */
object Curation {

  /** @param langFracs   per-language keep rates (empty = keep every language)
    * @param chunkWidth  tokens per chunk; `chunkStride` < width ⇒ overlap
    * @param ctx         context length chunks are packed into (per split) */
  case class Config(
      langFracs: Map[String, Double] = Map.empty,
      shingleN: Int = 3,
      sigK: Int = 16,
      splitNames: Seq[String] = Seq("train", "val", "test"),
      splitWeights: Seq[Double] = Seq(0.8, 0.1, 0.1),
      chunkWidth: Int = 64,
      chunkStride: Int = 48,
      ctx: Int = 512,
      sampleSeed: Int = 7,
      splitSeed: Int = 42)

  /** Runs the full pipeline; returns one row per packed chunk:
    * `doc, chunk_idx, chunk, n_tok, split, bin`. */
  def curate(docs: DataFrame, id: Column, text: Column, lang: Column,
      cfg: Config = Config()): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val quality = docs.filter(TextAnalysis.qualityClass(text) === "ok")
    val rebalanced =
      if (cfg.langFracs.isEmpty) quality
      else Sampling.stratifiedSample(quality, id, lang, cfg.langFracs,
        cfg.sampleSeed)
    val exact = Dedup.dedupExact(rebalanced,
      TextAnalysis.fingerprint(text), id)
    val fuzzy = Dedup.dedupExact(exact,
      call_function("minhash_signature", text,
        lit(cfg.shingleN), lit(cfg.sigK)),
      id)
    // split is a pure hash of the id, so it is RE-DERIVED on the chunk
    // output (whose `doc` IS the id) instead of joined back — a join here
    // would re-evaluate the whole quality→sample→dedup lineage a second
    // time (none of it is cached, by design) and add a shuffle for a value
    // the hash recomputes in-place, byte-identically
    val chunks = Chunking.chunk(fuzzy, id, text, cfg.chunkWidth,
        cfg.chunkStride)
      .withColumn("split",
        Sampling.splitColumn(col("doc"), cfg.splitNames, cfg.splitWeights,
          cfg.splitSeed))
    Chunking.pack(chunks, col("split"), cfg.ctx)
  }
}
