package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.ExactRound

/** Streaming topic-drift monitor — [[graft.ops.Similarity.shareDrift]]
  * pointed at an ARRIVAL stream (the corpusGate/EmbedStream discipline:
  * one code path, batch ≡ stream): tumbling-window topic shares over the
  * arrivals, diffed against a FROZEN reference snapshot's shares. The
  * monitor answers "is this hour's crawl drifting off the corpus's topic
  * mix?" while the batch [[graft.ops.Similarity.shareDrift]] answers the
  * release-vs-release question — same permille grid, same zero semantics.
  *
  * Design constraints the shape falls out of:
  *
  *  - a share is a RATIO of two aggregates; streaming append mode allows
  *    one stateful aggregation, so the per-topic counts and the window
  *    total must come from ONE `groupBy(window, g)` — the topic vocabulary
  *    is driver-sized by the q271/q278 contract (centroid topics), so each
  *    topic is one conditional-sum column, pivoted back to rows by a
  *    stateless explode AFTER the agg. This also gives vanishing-topic
  *    ZERO rows for free (every vocabulary topic emits per window-group,
  *    the full-outer-zero semantics of the batch op).
  *  - the reference is a broadcast-sized static table (groups × topics,
  *    [[refShares]]); the diff is a stream-static LEFT join — appearing
  *    topics fall back to reference share 0.
  *  - state is watermark-bounded: closed windows finalize and leave the
  *    store; the per-window state is |groups| × |topics| counters, nothing
  *    scales with arrivals.
  *
  * All arithmetic on the exact integer permille grid ([[ExactRound]]) —
  * batch output replays in DuckDB bit for bit (q284), and
  * StreamStaticSpec pins stream ≡ batch with the drift planted
  * mid-stream. */
object DriftStream {

  /** Per-(g, topic) permille share table of the frozen snapshot — the
    * static side of the monitor. Two counting passes + a broadcast join,
    * the [[graft.ops.Similarity.shareDrift]] shape. */
  def refShares(snapshot: DataFrame, g: Column, topic: Column): DataFrame = {
    val per = snapshot.groupBy(g.as("g"), topic.as("topic"))
      .agg(count(lit(1)).as("__n"))
    val tot = snapshot.groupBy(g.as("g")).agg(count(lit(1)).as("__tot"))
    per.join(broadcast(tot), "g")
      .select(col("g"), col("topic"),
        ExactRound.halfUpDivCol(col("__n") * lit(1000L), col("__tot"))
          .as("ref_permille"))
  }

  /** Monitor `arrivals` (any frame carrying a group, an assigned topic
    * and an event time — topic assignment is a stateless projection, so
    * it composes upstream): one row per (window, g, vocabulary topic)
    * with the window-local count, permille share, the reference share and
    * the signed drift delta. Works on a batch frame (the oracle-pinned
    * form) and an append-mode stream (watermark-bounded) from the same
    * code path. */
  def shareMonitor(arrivals: DataFrame, ts: Column, g: Column,
      topic: Column, topics: Seq[Long], refShares: DataFrame,
      windowDur: String, watermark: String): DataFrame = {
    require(topics.nonEmpty, "shareMonitor needs a topic vocabulary")
    val staged0 = arrivals.select(g.as("g"), topic.as("__topic"),
      ts.as("__ts"))
    val staged =
      if (staged0.isStreaming) staged0.withWatermark("__ts", watermark)
      else staged0
    val counts = staged
      .groupBy(window(col("__ts"), windowDur).as("__w"), col("g"))
      .agg(count(lit(1)).as("__tot"),
        topics.map(t => sum(when(col("__topic") === t, 1L).otherwise(0L))
          .as(s"__n$t")): _*)
    counts
      .select(unix_millis(col("__w.start")).as("win_ms"), col("g"),
        col("__tot"),
        explode(array(topics.map(t => struct(lit(t).as("topic"),
          col(s"__n$t").as("n"))): _*)).as("__t"))
      .select(col("win_ms"), col("g"), col("__t.topic").as("topic"),
        col("__t.n").as("n"),
        ExactRound.halfUpDivCol(col("__t.n") * lit(1000L), col("__tot"))
          .as("share_permille"))
      .join(refShares.select(col("g"), col("topic"),
        col("ref_permille").cast("long").as("__ref")),
        Seq("g", "topic"), "left")
      .select(col("win_ms"), col("g"), col("topic"), col("n"),
        col("share_permille"),
        coalesce(col("__ref"), lit(0L)).as("ref_permille"),
        (col("share_permille") - coalesce(col("__ref"), lit(0L)))
          .as("delta_permille"))
  }
}
