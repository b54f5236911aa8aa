package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.PortableHash

/** A row competing for a group's budget: `key` identifies it, `cost` is
  * what admitting it spends (tokens, bytes, rows — caller's unit). */
final case class BudgetRow(grp: String, key: Long, cost: Long)

/** Per-group admission state: the budget already spent. ONE long per live
  * group — bounded regardless of stream length, the property that lets
  * this run forever. */
final case class BudgetSpent(spent: Long)

/** Streaming token-budget admission — the ONLINE analogue of
  * [[graft.ops.Sampling.budgetPerGroup]]: admit each group's rows while the
  * group's running cost stays ≤ `budget`, drop the rest, forever.
  *
  * Semantics: ACROSS microbatches, admission is first-come-first-served
  * (an online admitter cannot re-rank rows it already emitted); WITHIN a
  * microbatch, rows are processed in the batch op's portable-hash order
  * and admission is a PREFIX over the remaining budget — the first row
  * that would overshoot CLOSES the batch for its group (no later, smaller
  * row is back-filled; for non-negative costs that prefix is exactly the
  * `cumsum ≤ budget` rule), so a stream that arrives as one batch admits
  * EXACTLY the set `budgetPerGroup` selects for ANY cost sequence
  * (spec-pinned, including an overshoot-then-fit sequence), and any
  * replay of the same batch sequence admits the same rows. State per
  * group is a single
  * running long; `flatMapGroupsWithState` keeps it in the state store, so
  * executor loss replays cleanly from the checkpoint.
  *
  * Scale shape: one hash exchange on the group key per microbatch (the
  * groupByKey), state store lookups are O(1) per group, and the sort is
  * per-group-per-batch — never global.
  */
object Admission {

  def budgetAdmit(rows: Dataset[BudgetRow], budget: Long,
      seed: Int = 11): Dataset[BudgetRow] = {
    require(budget > 0, s"budget must be positive, got $budget")
    implicit val rowEnc: Encoder[BudgetRow] = Encoders.product[BudgetRow]
    implicit val stEnc: Encoder[BudgetSpent] = Encoders.product[BudgetSpent]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    rows.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[BudgetRow], state: GroupState[BudgetSpent]) =>
          var spent = state.getOption.map(_.spent).getOrElse(0L)
          // the batch op's (hash, key) order — Jvm.md5Long60 reproduces
          // PortableHash.md5Long bit-for-bit, so a one-batch stream admits
          // exactly budgetPerGroup's selection
          val ordered = it.toIndexedSeq.sortBy(r =>
            (PortableHash.Jvm.md5Long60(r.key.toString, seed), r.key.toString))
          // prefix, not first-fit: the first overshoot ends admission for
          // this batch — matches budgetPerGroup's cumsum ≤ budget filter
          val kept = scala.collection.mutable.ArrayBuffer.empty[BudgetRow]
          val iter = ordered.iterator
          var open = true
          while (open && iter.hasNext) {
            val r = iter.next()
            if (spent + r.cost <= budget) { spent += r.cost; kept += r }
            else open = false
          }
          state.update(BudgetSpent(spent))
          kept.iterator
      }
  }

  /** Convenience: run a bounded admission stream to completion and return
    * the admitted rows (test/backfill path; production writes a sink). */
  def admitToCompletion(spark: SparkSession, rows: Dataset[BudgetRow],
      budget: Long, name: String, seed: Int = 11): Dataset[BudgetRow] = {
    implicit val rowEnc: Encoder[BudgetRow] = Encoders.product[BudgetRow]
    EventsStream.runToCompletion(
      budgetAdmit(rows, budget, seed).toDF(), name, OutputMode.Append())
      .as[BudgetRow]
  }
}
