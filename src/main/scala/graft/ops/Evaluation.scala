package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation estimators — the aggregation layer of an eval
  * harness. A training pipeline's other end: after curation, mixture and
  * training comes measurement, and the measurement tables (one row per
  * (task, sample) with a pass/fail verdict) are corpus-shaped exactly
  * like everything else here — per-benchmark sample counts × thousands
  * of tasks × many checkpoints. The estimators are tiny arithmetic; the
  * engine's job is making them EXACT (an eval number that differs by
  * 1e-9 between two runs of the "same" job poisons every regression
  * dashboard downstream, which is why the harness papers all publish the
  * numerically-stable product form).
  */
object Evaluation {

  /** pass@k — the unbiased estimator of Chen et al. 2021 ("Evaluating
    * Large Language Models Trained on Code", eq. 1): for a task with `n`
    * samples of which `c` pass, `pass@k = 1 − C(n−c,k)/C(n,k)`, the
    * probability a size-k draw without replacement contains a passing
    * sample. Computed in the paper's stable product form as a k-step
    * INTEGER fold on the nano grid:
    * `r_0 = 1e9; r_{i+1} = ⌊r_i·(n−c−i) / (n−i)⌋`, then
    * `pass@k_micro = 1e6 − halfUp(r_k / 1000)`.
    *
    * The fold IS the cross-engine spec: both engines run the identical
    * integer recurrence, so parity is exact by construction (the ⌊·⌋
    * per step deviates from the ideal binomial ratio by < k·1e-9 —
    * quantization of the ESTIMATOR, not an engine-parity risk). The
    * consecutive-integer numerator factors hit 0 exactly when `n−c < k`,
    * so "fewer than k failures → pass@k = 1" needs no special case;
    * tasks with `n < k` (estimator undefined) emit NULL.
    *
    * Scale shape: ONE partial-aggregable groupBy over the sample table,
    * then per-TASK-row arithmetic (k literal multiplies) — no window, no
    * join, codegen-fused. The `maxSamples` valve keeps `r·(n−c)` inside
    * int64 (1e9·maxSamples) and raises in-plan (`raise_error`, the
    * expandCopies discipline) rather than silently overflowing a
    * monster task. */
  def passAtK(df: DataFrame, task: Column, correct: Column,
      ks: Seq[Int] = Seq(1, 10),
      maxSamples: Long = 1000000L): DataFrame = {
    require(ks.nonEmpty && ks == ks.distinct && ks.forall(k => k >= 1 && k <= 64),
      s"ks must be distinct values in 1..64, got $ks")
    require(maxSamples >= 1 && maxSamples <= 9000000000L,
      s"maxSamples must be 1..9e9 (int64 headroom for the 1e9-grid " +
        s"fold), got $maxSamples")
    val counts = df.groupBy(task.as("task"))
      .agg(count(lit(1)).as("n"),
        sum(when(correct, 1L).otherwise(0L)).as("c"))
      .withColumn("n", when(col("n") <= maxSamples, col("n")).otherwise(
        raise_error(concat(
          lit(s"passAtK: task sample count exceeds maxSamples=" +
            s"$maxSamples: "), col("n").cast("string")))))
    ks.foldLeft(counts) { (acc, k) =>
      // greatest(n-i, 1): rows with n < k divide garbage here and are
      // NULLed below — the guard only dodges ANSI division-by-zero
      val fold = (0 until k).foldLeft("1000000000L") { (r, i) =>
        s"(($r) * (n - c - $i)) DIV greatest(n - $i, 1L)"
      }
      acc.withColumn(s"pass_at_${k}_micro",
        when(col("n") < k, lit(null).cast("long")).otherwise(
          lit(1000000L) - ExactRound.halfUpDiv(s"($fold)", "1000")))
    }
  }

  /** DuckDB twin of [[passAtK]] (`correctExpr` is a boolean SQL
    * expression over `tbl`'s columns). `//` is floor division vs
    * Spark's truncating `DIV` — equal on this fold because every
    * surviving intermediate is non-negative (the n < k garbage rows are
    * NULLed in both engines). */
  def passAtKSql(tbl: String, taskExpr: String, correctExpr: String,
      ks: Seq[Int] = Seq(1, 10)): String = {
    val passCols = ks.map { k =>
      val fold = (0 until k).foldLeft("1000000000::BIGINT") { (r, i) =>
        s"(($r) * (n - c - $i)) // greatest(n - $i, 1)"
      }
      s"""CASE WHEN n < $k THEN NULL ELSE CAST(1000000 -
         ${ExactRound.halfUpDivSql(s"($fold)", "1000")} AS BIGINT)
         END AS pass_at_${k}_micro"""
    }.mkString(",\n           ")
    s"""SELECT task, n, c, $passCols
       FROM (SELECT $taskExpr AS task, count(*) AS n,
           CAST(coalesce(sum(CASE WHEN $correctExpr THEN 1 ELSE 0 END),
             0) AS BIGINT) AS c
         FROM $tbl GROUP BY 1)"""
  }
}
