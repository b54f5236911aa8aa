package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

/** Drives the Structured Streaming pipelines against a file-source copy of
  * the events table and checks them against their batch twins. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-events-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("windowed streaming counts equal the batch aggregation") {
    val want = graft.queries.QueryUtil.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n"))
      .orderBy("start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    // Complete mode: every window, exact equality with the batch twin
    val complete = EventsStream.runToCompletion(
        EventsStream.windowedCounts(EventsStream.readEvents(spark, streamDir)),
        "win_complete", OutputMode.Complete())
      .orderBy("wstart", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(complete.nonEmpty && complete.toSeq === want.toSeq)
    // Append mode: watermark semantics — only finalized windows emit, and
    // each emitted row matches the batch result exactly
    val appended = EventsStream.runToCompletion(
        EventsStream.windowedCounts(EventsStream.readEvents(spark, streamDir)),
        "win_append", OutputMode.Append())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val wantSet = want.toSet
    assert(appended.nonEmpty && appended.length < want.length)
    assert(appended.forall(wantSet.contains))
  }

  test("stateful sessionization matches the batch session count") {
    val stream = EventsStream.readEvents(spark, streamDir)
    val got = EventsStream.runToCompletion(
        EventsStream.sessionize(stream).toDF(), "sessions", OutputMode.Update())
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = SparkEntry.queries("q33_events_sessions")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    assert(got.toSeq === batch.toSeq)
  }
}
