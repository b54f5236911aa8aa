package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of joins (each left row picks the most recent right row with
  * `rightTs <= leftTs`, per key) — the canonical time-series enrichment
  * operator Spark has no built-in for.
  *
  * Implementation is preference-tier (a) composition (SURVEY.md §7.3): tag
  * both sides, union on a common schema, and take a running `max(struct(ts,
  * payload))` over an event-time window per key — one shuffle on (key), no
  * range-join explosion, no custom physical operator needed. The running
  * max of a (ts, …) struct is exactly "latest right row so far", because
  * struct ordering is lexicographic on the leading ts.
  *
  * At scale this is shuffle-optimal: both sides partition once by key, and
  * the window is a single ordered pass per key — compare to the naive
  * `leftTs >= rightTs` theta-join, which is quadratic per key.
  */
object AsOf {

  /** Enrich `left` with the most recent `right` value column as of each left
    * timestamp. Output: left columns + `asof_<valueCol>` (null when no right
    * row precedes). Timestamps are exact epoch millis (cross-engine safe). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTsMs: Column, rightTsMs: Column, valueCol: String): DataFrame = {
    val lCols = left.columns
    val l = left.select(
      col(key).as("__k"), leftTsMs.as("__ts"), lit(1).as("__side"),
      lit(null).cast(right.schema(valueCol).dataType).as("__v"),
      struct(lCols.toIndexedSeq.map(col): _*).as("__row"))
    val r = right.select(
      col(key).as("__k"), rightTsMs.as("__ts"), lit(0).as("__side"),
      col(valueCol).as("__v"), lit(null).cast(l.schema("__row").dataType).as("__row"))
    // right rows sort before left rows at equal ts (__side 0 < 1), so a
    // right row AT the left timestamp is visible — inclusive as-of
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = l.unionByName(r)
      .withColumn("__latest",
        max(when(col("__side") === 0, struct(col("__ts"), col("__v")))).over(w))
    tagged.filter(col("__side") === 1)
      .select(col("__row.*") +: Seq(col("__latest.__v").as(s"asof_$valueCol")): _*)
  }
}
