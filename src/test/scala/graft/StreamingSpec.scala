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

  test("hopping-window streaming counts equal the batch aggregation (q122 twin)") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))
    val want = agg(graft.queries.QueryUtil.events(spark, sf))
      .orderBy("wstart", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val got = EventsStream.runToCompletion(
        agg(EventsStream.readEvents(spark, streamDir)),
        "hop_complete", OutputMode.Complete())
      .orderBy("wstart", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty && got.toSeq === want.toSeq)
  }

  test("stream-stream attribution join equals the batch interval join") {
    val within = 6 * 3600 * 1000L // 6h window keeps the fixture non-trivial
    val ev = graft.queries.QueryUtil.events(spark, sf)
    def side(t: String) = ev.filter(col("event_type") === t)
    val want = side("view").select(col("user_id").as("l_user"),
        col("event_id").as("l_event"), col("ts").as("l_ts"))
      .join(side("purchase").select(col("user_id").as("r_user"),
          col("event_id").as("r_event"), col("ts").as("r_ts")),
        col("l_user") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL ${within / 1000} SECONDS"))
      .select("l_event", "r_event").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    val stream = EventsStream.readEvents(spark, streamDir)
    val got = EventsStream.runToCompletion(
        EventsStream.attributionJoin(stream, stream, "view", "purchase", within),
        "attrib", OutputMode.Append())
      .select("l_event", "r_event").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("deterministic sampling/splitting works unchanged on a stream") {
    // hash split + stratified sample are stateless narrow ops, so the same
    // Column works under readStream; membership must match batch exactly
    import graft.ops.Sampling
    val docDir = Files.createTempDirectory("graft-docs-stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      docDir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = spark.read.parquet(s"$sf/documents.parquet")
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docDir.toString)
    val sampled = Sampling.stratifiedSample(stream, col("doc_id"), col("lang"),
        Map("en" -> 0.5, "de" -> 0.25))
      .select(col("doc_id"), Sampling.trainValTest(col("doc_id")).as("split"))
    val got = EventsStream.runToCompletion(sampled, "sampled_stream",
        OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Sampling.stratifiedSample(batchDocs, col("doc_id"), col("lang"),
        Map("en" -> 0.5, "de" -> 0.25))
      .select(col("doc_id"), Sampling.trainValTest(col("doc_id")).as("split"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.nonEmpty && got === want)
  }

  test("chunking runs unchanged on a stream with batch-identical output") {
    import graft.ops.Chunking
    val docDir = Files.createTempDirectory("graft-chunk-stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      docDir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = spark.read.parquet(s"$sf/documents.parquet")
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docDir.toString)
    val got = EventsStream.runToCompletion(
        Chunking.chunk(stream, col("doc_id"), col("text"), 64, 48),
        "chunk_stream", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val want = Chunking.chunk(batchDocs, col("doc_id"), col("text"), 64, 48)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got.nonEmpty && got === want)
  }

  test("r11 stateless gates compose on a stream unchanged: markup strip + " +
    "NFC hygiene + FIM transform, batch-identical output") {
    import graft.ops.{Chunking, Curation, TextAnalysis => TA}
    val docDir = Files.createTempDirectory("graft-r11-stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      docDir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = spark.read.parquet(s"$sf/documents.parquet")
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docDir.toString)
    // the full r11 projection chain: wrap in markup → strip → NFC
    // normalize → FIM — every stage a per-row expression, so the same
    // code runs under readStream with zero changes (Curation.hygiene's
    // C4 gates would drop the whole synthetic corpus — its streaming
    // parity is the existing curation-stream tests' job)
    def pipe(df: org.apache.spark.sql.DataFrame) = {
      val wrapped = df.withColumn("t2",
        concat(lit("<p>"), col("text"), lit("</p><script>x()</script>")))
      Chunking.fimTransform(
        wrapped.withColumn("t3",
          TA.normalizeText(TA.stripMarkup(col("t2")), "NFC")),
        col("doc_id"), col("t3"), rate = 0.5, seed = 17)
        .select(col("id"), col("applied"), col("fim_text"))
    }
    val got = EventsStream.runToCompletion(pipe(stream), "r11_stream",
        OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSet
    val want = pipe(batchDocs)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSet
    assert(got.nonEmpty && got === want)
  }

  test("streaming signature near-dup filter matches the batch filter") {
    import graft.ops.Dedup
    val docDir = Files.createTempDirectory("graft-dedup-stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      docDir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = spark.read.parquet(s"$sf/documents.parquet")
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docDir.toString)
    // the signature is a stateless projection, so dropDuplicates composes
    // on an append stream; batch twin must keep the same documents
    val got = EventsStream.runToCompletion(
        Dedup.nearDupFilterBySignature(stream, col("doc_id"), col("text"), 3, 16)
          .select("doc_id"),
        "neardup_stream", OutputMode.Append())
      .collect().map(_.getLong(0)).toSet
    val want = Dedup.nearDupFilterBySignature(batchDocs, col("doc_id"),
        col("text"), 3, 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch dropDuplicates keeps an arbitrary row per signature; compare
    // the per-signature counts instead of exact ids
    assert(got.size === want.size && got.size < batchDocs.count())
  }

  test("streaming curation ≡ batch curation on dedup-free input") {
    import graft.ops.{Curation, Dedup}
    import graft.ops.TextAnalysis
    val cfg = Curation.Config()
    val batchDocs = spark.read.parquet(s"$sf/documents.parquet")
    // dedup-free input = survivors of BOTH batch dedup stages, so the
    // stream's first-arrival keep and batch's min-id keep cannot diverge:
    // every key is unique, both keeps are the identity
    val exact = Dedup.dedupExact(
      batchDocs.filter(TextAnalysis.qualityClass(col("text")) === "ok"),
      TextAnalysis.fingerprint(col("text")), col("doc_id"))
    val dedupFree = Dedup.nearDupFilterBySignature(exact, col("doc_id"),
      col("text"), cfg.shingleN, cfg.sigK)
    val srcDir = Files.createTempDirectory("graft-curate-stream").toString
    dedupFree.write.parquet(s"$srcDir/docs")
    val input = spark.read.parquet(s"$srcDir/docs")
    val stream = spark.readStream.schema(input.schema).parquet(s"$srcDir/docs")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3), r.getString(4))
    val got = EventsStream.runToCompletion(
        Curation.curateStream(stream, col("doc_id"), col("text"), col("lang"), cfg),
        "curate_stream", OutputMode.Append())
      .collect().map(key).toSet
    val want = Curation.curateChunks(input, col("doc_id"), col("text"),
        col("lang"), cfg)
      .collect().map(key).toSet
    assert(got.nonEmpty && got === want)
  }

  test("streaming curation keeps exactly one survivor per planted dup group") {
    import graft.ops.Curation
    import spark.implicits._
    // 4 groups × 3 exact copies; texts long+clean enough to pass quality
    val base = (0 until 4).map(g =>
      s"group $g " + (0 until 40).map(i => s"token${g}_$i").mkString(" "))
    val rows = for (g <- 0 until 4; c <- 0 until 3)
      yield (g * 10L + c, base(g), "en")
    val srcDir = Files.createTempDirectory("graft-curate-dups").toString
    rows.toDF("doc_id", "text", "lang").coalesce(1).write.parquet(s"$srcDir/docs")
    val input = spark.read.parquet(s"$srcDir/docs")
    val stream = spark.readStream.schema(input.schema).parquet(s"$srcDir/docs")
    val out = EventsStream.runToCompletion(
        Curation.curateStream(stream, col("doc_id"), col("text"), col("lang")),
        "curate_dups", OutputMode.Append())
      .select("doc").distinct().collect().map(_.getLong(0)).toSeq
    assert(out.length === 4, s"one survivor per group, got $out")
    // each survivor belongs to a distinct planted group
    assert(out.map(_ / 10).sorted === Seq(0L, 1L, 2L, 3L))
  }

  test("watermark-bounded streaming curation dedups like the unbounded mode") {
    import graft.ops.Curation
    import spark.implicits._
    val base = (0 until 3).map(g =>
      s"wm group $g " + (0 until 40).map(i => s"wtok${g}_$i").mkString(" "))
    // duplicates arrive within seconds of each other — inside any sane
    // watermark delay, so bounded state must drop them exactly like the
    // unbounded mode (state for old keys is reclaimed, behavior identical)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = for (g <- 0 until 3; c <- 0 until 3) yield
      (g * 10L + c, base(g), "en",
        new java.sql.Timestamp(t0.getTime + (g * 3 + c) * 1000L))
    val srcDir = Files.createTempDirectory("graft-curate-wm").toString
    rows.toDF("doc_id", "text", "lang", "ts").coalesce(1)
      .write.parquet(s"$srcDir/docs")
    val input = spark.read.parquet(s"$srcDir/docs")
    val stream = spark.readStream.schema(input.schema).parquet(s"$srcDir/docs")
    val out = EventsStream.runToCompletion(
        Curation.curateStream(stream, col("doc_id"), col("text"), col("lang"),
          Curation.Config(), eventTime = Some((col("ts"), "10 minutes"))),
        "curate_wm", OutputMode.Append())
      .select("doc").distinct().collect().map(_.getLong(0)).toSeq
    assert(out.length === 3, s"one survivor per group, got $out")
    assert(out.map(_ / 10).sorted === Seq(0L, 1L, 2L))
  }

  test("space-saving sketch survives the streaming state store: complete-mode " +
    "stream equals the batch heavy hitters") {
    import graft.ops.TextAnalysis
    graft.GraftExtensions.ensureRegistered(spark)
    val want = TextAnalysis.heavyHitters(
        graft.queries.QueryUtil.events(spark, sf),
        lit("all"), col("event_type"), capacity = 64, k = 5)
      .collect().map(r => (r.getInt(1).toLong, r.getString(2), r.getLong(3), r.getLong(4)))
    // the sketch partials serialize through the streaming state store
    // between micro-batches — merge + serde correctness under streaming
    val agg = EventsStream.readEvents(spark, streamDir)
      .groupBy(lit("all").as("grp"))
      .agg(call_function("space_saving", col("event_type"), lit(64)).as("hh"))
    val got = EventsStream.runToCompletion(agg, "hh_stream", OutputMode.Complete())
      .select(col("grp"), posexplode(slice(col("hh"), 1, 5)))
      .select((col("pos") + 1).cast("long"), col("col.term"), col("col.cnt"),
        col("col.err"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.toSeq === want.toSeq)
    // capacity covers the event-type universe, so streamed counts are exact
    got.foreach { case (_, _, _, err) => assert(err === 0L) }
  }

  test("lsh recall@k is measurable and maxes out when probing every bucket") {
    import graft.ops.Similarity
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val query = embs.limit(1).select(col("embedding"))
    val exact = Similarity.bruteForceTopK(embs, col("vec_id"),
      col("embedding"), query, col("embedding"), k = 10)
    // probing all 2^bits buckets makes LSH exhaustive => recall 1.0 —
    // which also proves the best-first probe generator emits every mask
    // exactly once (a duplicate would starve some bucket of its probe)
    for ((bits, probes) <- Seq((2, 4), (4, 16))) {
      val all = Similarity.lshTopKMultiprobe(embs, col("vec_id"),
        col("embedding"), query, col("embedding"), bits, probes, k = 10)
      assert(Similarity.recallAtK(all, exact, 10) === 1.0,
        s"bits=$bits nProbe=$probes must be exhaustive")
    }
    val one = Similarity.lshTopK(embs, col("vec_id"), col("embedding"),
      query, col("embedding"), bits = 2, k = 10)
    val r1 = Similarity.recallAtK(one, exact, 10)
    assert(r1 >= 0.0 && r1 <= 1.0)
  }

  test("streaming profile (single-scan HLL variant) equals the batch profile") {
    // the continuous data-quality monitor: profile's one-aggregation form
    // (approxDistinct=true — the 100 TB default) runs unchanged on a
    // stream in complete mode; HLL merge is order-independent, so the
    // stream must equal the batch bit-for-bit
    val batchDf = graft.queries.QueryUtil.events(spark, sf)
      .select("event_type", "value")
    def prof(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Profiling.profile(df, approxDistinct = true)
    val want = prof(batchDf).orderBy("column").collect().toSeq
    val stream = EventsStream.readEvents(spark, streamDir)
      .select("event_type", "value")
    val got = EventsStream.runToCompletion(prof(stream), "profile_stream",
        OutputMode.Complete())
      .orderBy("column").collect().toSeq
    assert(got === want && got.nonEmpty)
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
