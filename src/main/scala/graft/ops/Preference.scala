package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise-preference TOURNAMENT aggregation — the reward-modeling prep
  * step between raw human/AI judgments and a per-prompt candidate ranking.
  * A post-training pipeline collects many noisy pairwise judgments
  * (`prompt, a, b, winner`, several judges per pair); reward-model and
  * best-of-n training want one deterministic ranking per prompt that is
  * robust to (a) judge noise (majority vote per pair) and (b) non-transitive
  * preferences (Condorcet cycles — a naive win-count ranking silently
  * launders them, Copeland scoring surfaces them as ties the total
  * tie-break then resolves reproducibly).
  *
  * Everything is EXACT integer arithmetic (counts, Copeland = pairs won −
  * pairs lost on the majority relation, win rate on the half-up permille
  * grid via [[ExactRound.halfUpDivCol]]) — no floats anywhere, so the
  * ranking replays bit-identically in any engine.
  *
  * Scale shape: one partial-aggregable groupBy per (prompt, pair) for the
  * majority vote, one valved 2-row explode, one partial-aggregable groupBy
  * per (prompt, candidate), and ONE rank window partitioned by prompt whose
  * partitions hold at most the sampler's candidate budget (n is 4–64 in any
  * best-of-n/RLHF recipe, never data-sized — the
  * [[graft.streaming.PreferenceStream.bestOfN]] contract). Nothing shuffles
  * more than the judgment table hashed by prompt. */
object Preference {

  /** Majority edge per (prompt, unordered pair): winner of the strict
    * judgment majority, NULL on an exact tie (a tied pair contributes to
    * neither side's Copeland score). Pairs are normalized to
    * `lo = least(a, b), hi = greatest(a, b)` so the same pair judged in
    * either orientation aggregates together. A judgment whose `winner` is
    * neither side raises loudly (corrupt upstream join — never silently
    * dropped, the [[Sampling.expandCopies]] valve discipline). */
  def pairMajority(judgments: DataFrame, prompt: Column, a: Column,
      b: Column, winner: Column): DataFrame =
    pairCounts(judgments, prompt, a, b, winner)
      .withColumn("maj",
        when(col("wins_lo") > col("wins_hi"), col("lo"))
          .when(col("wins_hi") > col("wins_lo"), col("hi")))

  /** The ADDITIVE half of [[pairMajority]]: per-(prompt, normalized pair)
    * raw win counts, no majority derivation — counts from disjoint
    * judgment batches SUM to the full-corpus counts, which is what makes
    * the tournament incrementally maintainable (the streaming gate's
    * increments are exactly this shape). */
  def pairCounts(judgments: DataFrame, prompt: Column, a: Column,
      b: Column, winner: Column): DataFrame = {
    val lo = least(a, b)
    val hi = greatest(a, b)
    val wlo = when(winner === lo, 1L).when(winner === hi, 0L)
      .otherwise(raise_error(concat(
        lit("pairMajority: winner outside {a, b}: "),
        winner.cast("string"))).cast("long"))
    judgments
      .select(prompt.as("prompt"), lo.as("lo"), hi.as("hi"), wlo.as("__wlo"))
      .groupBy("prompt", "lo", "hi")
      .agg(sum("__wlo").as("wins_lo"),
        (count(lit(1)) - sum("__wlo")).as("wins_hi"))
  }

  /** Per-(prompt, candidate) tournament table: Copeland score over the
    * majority relation, pairs won/lost/faced, raw judgment wins, judgments
    * involving the candidate, win rate on the exact half-up permille grid,
    * and the final `rnk` (1 = best) under the deterministic total order
    * `copeland DESC, j_wins DESC, cand ASC` — so a 3-cycle's members (all
    * Copeland 0 against each other) rank by raw wins, then by id, never by
    * partition luck. */
  def rankCandidates(judgments: DataFrame, prompt: Column, a: Column,
      b: Column, winner: Column): DataFrame =
    rankFromPairCounts(pairMajority(judgments, prompt, a, b, winner))

  /** [[rankCandidates]] from PRE-AGGREGATED pair counts — the entry point
    * for incremental/streaming aggregation ([[
    * graft.streaming.PreferenceStream.evolvingRank]]): per-pair win
    * counts are ADDITIVE across arrival batches, so a continuously
    * maintained counts table re-ranks without ever replaying raw
    * judgments. Input must expose `prompt, lo, hi, wins_lo, wins_hi`
    * (normalized pairs, lo < hi); the majority column is derived here so
    * callers only ever merge integer counts. */
  def rankFromPairCounts(counts: DataFrame): DataFrame = {
    val pm = counts.withColumn("maj",
      when(col("wins_lo") > col("wins_hi"), col("lo"))
        .when(col("wins_hi") > col("wins_lo"), col("hi")))
    val side = (cand: Column, self: Column, other: Column, jw: Column) =>
      struct(cand.as("cand"),
        when(col("maj") === self, 1L).otherwise(0L).as("won"),
        when(col("maj") === other, 1L).otherwise(0L).as("lost"),
        jw.as("jw"), (col("wins_lo") + col("wins_hi")).as("jn"))
    val sides = pm.select(col("prompt"), explode(array(
        side(col("lo"), col("lo"), col("hi"), col("wins_lo")),
        side(col("hi"), col("hi"), col("lo"), col("wins_hi")))).as("s"))
      .select(col("prompt"), col("s.*"))
    sides.groupBy("prompt", "cand")
      .agg((sum("won") - sum("lost")).as("copeland"),
        sum("won").as("pairs_won"), sum("lost").as("pairs_lost"),
        count(lit(1)).as("n_pairs"),
        sum("jw").as("j_wins"), sum("jn").as("n_judgments"))
      .withColumn("win_permille",
        ExactRound.halfUpDivCol(col("j_wins") * 1000L, col("n_judgments")))
      .withColumn("rnk", row_number().over(Window.partitionBy("prompt")
        .orderBy(col("copeland").desc, col("j_wins").desc, col("cand"))))
  }
}
