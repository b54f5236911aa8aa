package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: file-source streaming,
  * watermarked tumbling-window aggregation, and stateful sessionization.
  *
  * The reference has no streaming at all (SURVEY.md §2.10 — its only
  * incremental behavior is a 20 s directory poll, worker.py:163-168); this is
  * the Spark-native upgrade of that pattern: `readStream` over a directory is
  * exactly "notice new files", with exactly-once processing and bounded state
  * via watermarks.
  *
  * Batch twins of these pipelines are oracle-checked as q32/q33
  * ([[graft.queries.EventsQueries]]); the specs here drive the streaming
  * execution itself (memory sink, processAllAvailable).
  */
object EventsStream {

  /** File-source stream over a directory of events parquet. Streaming
    * sources need a declared schema; one driver-side batch footer read
    * discovers the stored `ts` physical type (nanos-as-long legacy shards
    * vs native µs timestamps), and [[graft.queries.QueryUtil.normalizeTs]]
    * folds both generations to the same TIMESTAMP column the batch reader
    * produces — so stream≡batch twin specs hold across testdata versions. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stored = spark.read.parquet(dir).schema
    spark.readStream
      .schema(stored)
      .parquet(dir)
      .withColumn("ts", graft.queries.QueryUtil.normalizeTs(stored("ts").dataType))
  }

  /** Watermarked tumbling-window counts per event type — late data beyond
    * `watermark` is dropped and window state is reclaimed (bounded state at
    * any scale). */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  final case class UserEvent(user_id: Long, event_id: Long, tsMs: Long)
  final case class UserSessionState(nEvents: Long, nSessions: Long, lastMs: Long)
  final case class UserSessionUpdate(user_id: Long, n_events: Long, n_sessions: Long)

  /** Stateful sessionization with mapGroupsWithState: per-user session
    * counter with a 30-minute inactivity gap, state kept per key only. */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): Dataset[UserSessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tsMs"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserSessionState]) =>
          val prev = state.getOption.getOrElse(UserSessionState(0L, 0L, Long.MinValue))
          // events within a micro-batch arrive unordered: sort by (ts, id)
          val sorted = rows.toSeq.sortBy(e => (e.tsMs, e.event_id))
          var (n, sessions, last) = (prev.nEvents, prev.nSessions, prev.lastMs)
          sorted.foreach { e =>
            if (last == Long.MinValue || e.tsMs - last > gapMs) sessions += 1
            n += 1
            last = e.tsMs
          }
          state.update(UserSessionState(n, sessions, last))
          UserSessionUpdate(user, n, sessions)
      }
  }

  final case class TypedEvent(user_id: Long, event_id: Long, tsUs: Long,
    event_type: String)
  final case class LastEvent(tsUs: Long, eventId: Long, eventType: String)
  final case class Transition(user_id: Long, cur: String, nxt: String)

  /** Stateful event-transition extraction: per-user (current → next) pairs
    * from the ts-ordered chain — the streaming feed of the q218 transition
    * matrix (downstream `groupBy(cur, nxt).count` keeps the live Markov
    * counts). State per key is ONE row: the user's last-seen event; each
    * micro-batch sorts its own slice and emits the boundary transition
    * from state plus the in-batch pairs. Exactly the batch `lead()`
    * semantics when ingestion is event-time ordered across batches (the
    * file/offset sources here replay in order; an out-of-order source
    * needs an upstream watermark sort, same caveat [[sessionize]]
    * documents for its gap rule). */
  def transitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsUs"),
        col("event_type"))
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[TypedEvent], state: GroupState[LastEvent]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
            var last = state.getOption
            sorted.foreach { e =>
              last.foreach(l => out += Transition(user, l.eventType, e.event_type))
              last = Some(LastEvent(e.tsUs, e.event_id, e.event_type))
            }
            state.update(last.get)
            out.iterator
          }
      }
  }

  /** Streaming exact dedup: drop re-delivered events by key, with state
    * bounded by the watermark (the streaming twin of
    * [[graft.ops.Dedup.dedupExact]] — at-least-once sources become
    * effectively-once downstream). */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static join: enrich the event stream against a static dimension
    * (re-read per micro-batch, broadcast by Catalyst when small) — the
    * streaming twin of the fact⋈dim star join. */
  def enriched(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.join(dim, col(eventKey) === col(dimKey))

  /** Stream-stream interval join: attribute each `right` event to a prior
    * `left` event of the same user within `withinMs` (click→purchase
    * attribution). Both sides are watermarked and the join carries the
    * time-range predicate, so Spark bounds BOTH state stores: a buffered
    * left row is dropped once the right watermark passes its ts + withinMs —
    * the only stream-stream join shape that survives unbounded input. */
  def attributionJoin(left: DataFrame, right: DataFrame, leftType: String,
      rightType: String, withinMs: Long, watermark: String = "2 hours"): DataFrame = {
    val l = left.filter(col("event_type") === leftType)
      .select(col("user_id").as("l_user"), col("event_id").as("l_event"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("event_id").as("r_event"),
        col("ts").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMs MILLISECOND"))
  }

  /** Run a streaming DataFrame to completion against the available input and
    * return the materialized result (memory sink). */
  def runToCompletion(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }

  /** Drain the currently-available input through a durable FILE sink with a
    * checkpoint — the production shape (exactly-once output via the sink's
    * _spark_metadata log; offsets + state-store snapshots under `ckptDir`).
    * Calling this again after a stop — new files pending, same checkpoint —
    * is a crash-recovery resume: processed batches never replay and
    * stateful operators (dropDuplicates, flatMapGroupsWithState) continue
    * from their recovered state. Read `outDir` for everything emitted
    * across all lifetimes. */
  def drainCheckpointed(df: DataFrame, outDir: String, ckptDir: String): Unit = {
    val q = df.writeStream.outputMode(OutputMode.Append)
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckptDir).start()
    try q.processAllAvailable() finally q.stop()
  }
}
