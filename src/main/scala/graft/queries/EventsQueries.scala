package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.ExactRound
import QueryUtil._

/** Event-stream analytics over the `events` table, batch side. These are the
  * batch equivalents of the Structured Streaming pipelines in
  * [[graft.streaming.EventsStream]] (same plan shape: tumbling windows,
  * sessionization) so the semantics get a DuckDB oracle here while the
  * streaming module exercises watermarks/state in its spec.
  *
  * Cross-engine notes: epoch millis (exact int64) are used for all time
  * arithmetic — interval types and ns→µs truncation differ across engines,
  * integer milliseconds do not. */
object EventsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON extraction from the props column (SURVEY §2.8 scalar surface)
    "q31_json_extract" -> ((s, d) => {
      events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").cast("long").as("sum_k"),
          round(avg("k"), 6).as("avg_k"))
        .orderBy("event_type")
    }),

    // tumbling 1-hour window aggregation (batch twin of the streaming agg)
    "q32_events_window" -> ((s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("wstart", "event_type")
    }),

    // HOPPING (sliding) 1-hour window, 30-minute hop: each event lands in
    // exactly window/hop = 2 overlapping windows — the standard smoothing
    // window the streaming module exposes; batch twin so the oracle can
    // replay it (each event duplicated into its two window starts).
    "q122_events_hopping" -> ((s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"),
          col("sum_value"))
        .orderBy("wstart", "event_type")
    }),

    // backward as-of join: each event enriched with its user's most recent
    // signup time (graft.ops.AsOf — union + running struct-max, one shuffle)
    "q67_asof_join" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("us"), col("us").as("sus"))
      graft.ops.AsOf.asOfJoin(ev, signups, "user_id", col("us"), col("us"), "sus")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), count(col("asof_sus")).as("n_with_signup"),
          round(avg((col("us") - col("asof_sus")) / 1000000.0), 4).as("avg_secs_since"))
        .orderBy("event_type")
    }),

    // interval join via graft.ops.RangeJoin: events falling inside
    // "hot windows" ([hour-30min, hour+90min) around above-average hours) —
    // overlapping, non-bucket-aligned ranges, so it exercises the true
    // range-join path, not an hour equi-join. Hotness threshold is pure
    // integer arithmetic (n·hours·5 ≥ total·6 ⟺ n ≥ 1.2·mean) so both
    // engines cut identically.
    "q76_range_join" -> ((s, d) => {
      val H = 3600000000L // 1 hour in µs
      val e = events(s, d).select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val hb = e.groupBy(expr(s"us div $H").as("b")).agg(count(lit(1)).as("n"))
      val tot = e.agg(count(lit(1)).as("t"))
      val nh = hb.agg(count(lit(1)).as("h"))
      val hot = hb.crossJoin(broadcast(tot)).crossJoin(broadcast(nh))
        .filter(col("n") * col("h") * 5 >= col("t") * 6)
        .select((col("b") * H - H / 2).as("s"), (col("b") * H + 3 * H / 2).as("e2"))
      graft.ops.RangeJoin.pointInRange(e, col("us"), hot, col("s"), col("e2"), H)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("event_id")).as("n_events"))
        .orderBy("event_type")
    }),

    // sessionization: 30-min inactivity gap, per-user session stats
    "q33_events_sessions" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("new_session",
          when(col("ms") - lag("ms", 1).over(byUser) > 1800000L, 1)
            .when(lag("ms", 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("session_id", sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("session_events"))
        .groupBy("user_id")
        .agg(max("session_id").cast("long").as("n_sessions"),
          sum("session_events").cast("long").as("n_events"),
          max("session_events").cast("long").as("max_session_events"))
        .orderBy("user_id")
    }),

    // cohort retention matrix — the standard product-analytics report:
    // users grouped by first-activity week, counted in each later week
    // they return. Weeks are integer 7-day buckets of epoch days (TZ-free
    // integer arithmetic, never calendar-week trunc — engines disagree on
    // week starts). Two partial-aggregable passes + one co-partitioned
    // join on user_id; no window, no global sort.
    "q204_retention_cohorts" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("unix_millis(ts) DIV 86400000 DIV 7").as("wk"))
      val cohort = ev.groupBy("user_id").agg(min("wk").as("cw"))
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("cw"), (col("wk") - col("cw")).as("off"))
        .distinct()
        .groupBy(col("cw").as("cohort_week"), col("off").as("offset_weeks"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    }),

    // ordered conversion funnel signup → view → purchase: each stage's
    // timestamp must STRICTLY follow the previous stage's (min-ts
    // semantics, exact integer micros). Three co-partitioned user_id
    // aggregations/joins — the textbook distributed funnel shape; per-user
    // stage times then collapse to the stage report
    "q205_event_funnel" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("t1"))
      val t2 = ev.filter(col("event_type") === "view").join(t1, "user_id")
        .filter(col("us") > col("t1"))
        .groupBy("user_id").agg(min("us").as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
        .filter(col("us") > col("t2"))
        .groupBy("user_id").agg(min("us").as("t3"))
      val n1 = t1.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_signup"))
      val n2 = t2.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_view"))
      val n3 = t3.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase"))
      n1.union(n2).union(n3).select(col("stage"), col("n")).orderBy("stage")
    }),

    // date-spine gap filling: a sparse daily series (user 7's purchases)
    // densified over the CORPUS date range with zero rows for silent days —
    // the report-correctness op every BI layer needs; spine = generated
    // integer epoch-day sequence (TZ-free), one left join
    "q213_date_spine" -> ((s, d) => {
      val ev = events(s, d)
        .select(expr("unix_millis(ts) DIV 86400000").as("day"),
          col("user_id"), col("event_type"), col("value"))
      val sparse = ev.filter(col("user_id") === 7 &&
          col("event_type") === "purchase")
        .groupBy("day")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      val spine = ev.agg(min("day").as("lo"), max("day").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      spine.join(sparse, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("day")
    }),

    // session-length distribution: q33's 30-minute sessionization rolled
    // up to a histogram of events-per-session — the engagement-shape
    // report (how long are visits?); exact integer buckets
    "q240_session_histogram" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("new_session",
          when(col("ms") - lag("ms", 1).over(byUser) > 1800000L, 1)
            .when(lag("ms", 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("session_id", sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("session_events"))
        .groupBy("session_events")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy("session_events")
    }),

    // windowed conversion: q205's ordered funnel with a DEADLINE — the
    // view must follow signup within 3 days, the purchase within 7 days
    // of that view (exact integer micros; the report marketing actually
    // asks for: "converted within N days", not "ever")
    "q238_windowed_funnel" -> ((s, d) => {
      val dayUs = 86400000000L
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("t1"))
      val t2 = ev.filter(col("event_type") === "view").join(t1, "user_id")
        .filter(col("us") > col("t1") && col("us") <= col("t1") + 3 * dayUs)
        .groupBy("user_id").agg(min("us").as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
        .filter(col("us") > col("t2") && col("us") <= col("t2") + 7 * dayUs)
        .groupBy("user_id").agg(min("us").as("t3"))
      val n1 = t1.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_signup"))
      val n2 = t2.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_view_3d"))
      val n3 = t3.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase_7d"))
      n1.union(n2).union(n3).select(col("stage"), col("n")).orderBy("stage")
    }),

    // frequent event paths: per-user ts-ordered event-type 3-grams counted
    // corpus-wide, top-10 — the "common journeys" report; two leads on the
    // user window, partial-aggregable counts, heap top-k
    "q239_frequent_paths" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
      events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("e2", lead("event_type", 1).over(byUser))
        .withColumn("e3", lead("event_type", 2).over(byUser))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),

    // RFM segmentation — the classic customer-value report: per user,
    // recency (days since last purchase vs corpus max), frequency and
    // 2-decimal monetary, each quintiled into a 3-digit segment code.
    // Integer/money-grid inputs with user_id tie-breaks make every ntile
    // boundary deterministic. The rank runs over the USER aggregate (a
    // table orders of magnitude under the event log; at consumer scale
    // partition the quintiles per region or swap in the GK-threshold
    // gate, q191's shape)
    "q235_rfm_segments" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("value"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val now = ev.agg(max("day").as("now_day"))
      ev.crossJoin(broadcast(now))
        .groupBy("user_id")
        .agg(min(col("now_day") - col("day")).as("recency_days"),
          count(lit(1)).as("frequency"),
          round(sum("value"), 2).as("monetary"))
        .withColumn("r", ntile(5).over(
          Window.orderBy(col("recency_days"), col("user_id"))))
        .withColumn("f", ntile(5).over(
          Window.orderBy(col("frequency").desc, col("user_id"))))
        .withColumn("m", ntile(5).over(
          Window.orderBy(col("monetary").desc, col("user_id"))))
        .withColumn("segment", col("r") * 100 + col("f") * 10 + col("m"))
        .orderBy("user_id")
    }),

    // event-transition matrix (user-flow analysis): P(next | current) from
    // per-user ts-ordered event chains — lead() window on the user key,
    // integer pair counts, one division per cell on the r6 grid
    "q218_transition_matrix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
      events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("nxt", lead("event_type", 1).over(byUser))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", ExactRound.ratioRoundedCol(col("n"),
          sum("n").over(Window.partitionBy("cur")), 6))
        .orderBy("cur", "nxt")
    }),

    // time-to-convert histogram: whole days between a user's first signup
    // and their first purchase AFTER it (q205's stage-1/2 chaining), exact
    // integer micros bucketed by integer division
    "q219_conversion_latency" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("t1"))
      val t2 = ev.filter(col("event_type") === "purchase").join(t1, "user_id")
        .filter(col("us") > col("t1"))
        .groupBy("user_id").agg(min("us").as("t2"), min("t1").as("t1m"))
      t2.select(expr("(t2 - t1m) DIV 86400000000").as("days_to_convert"))
        .groupBy("days_to_convert").agg(count(lit(1)).as("n_users"))
        .orderBy("days_to_convert")
    }),

    // per-type event-rate anomaly flags: each (event_type, day) count
    // tested against its trailing-7-CALENDAR-day mean ± 2σ — the
    // ingest-volume monitor that catches a collapsed or runaway source.
    // The window is RANGE-based on the integer day key, so silent days
    // genuinely age out of the baseline (a ROWS frame would slide over
    // OBSERVATIONS and compare a sparse source against a weeks-old
    // baseline); a source must still have ≥ 3 observed days in the
    // trailing week before it can flag. All moments derive from exact
    // integer sums (Σn, Σn², counts) with one deterministic IEEE op
    // chain per row, so the FLAG itself pins cross-engine; windows
    // partition by the entity key (per-source monitors at scale), never
    // a global sort
    "q217_rate_anomaly" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .select(col("event_type"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rangeBetween(-7, -1)
      daily
        .withColumn("c", count(col("n")).over(w))
        .withColumn("s1", sum(col("n")).over(w))
        .withColumn("s2", sum(col("n") * col("n")).over(w))
        .withColumn("mu", col("s1").cast("double") / col("c"))
        .withColumn("sig", sqrt(greatest(
          col("s2").cast("double") / col("c") - col("mu") * col("mu"),
          lit(0.0))))
        .withColumn("anomaly", col("c") >= 3 &&
          abs(col("n") - col("mu")) > lit(2.0) * col("sig"))
        .select(col("event_type"), col("day"), col("n"),
          round(coalesce(col("mu"), lit(0.0)), 4).as("mu"),
          round(coalesce(col("sig"), lit(0.0)), 4).as("sigma"),
          col("anomaly"))
        .orderBy("event_type", "day")
    }),

    // freshness-decayed activity score: step decay in weekly half-lives —
    // weight 1/2^k with INTEGER k = age DIV 7 (pow with fractional
    // exponents is transcendental and cross-engine hazardous; shifts are
    // not). The sum is EXACT integer arithmetic: 2-decimal money values as
    // cents, weights as left-shifts against a clamped budget (k ≤ 20), one
    // final IEEE division — summation order cannot move the rounded score
    // (a plain double Σ(value·w) flipped the r4 grid by 1 ulp at sf0.001).
    // "now" is the corpus max ts (data-derived, reproducible); top-10
    // users by the rounded score — recency weighting for sampling/ranking
    "q214_freshness_decay" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("value"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val now = ev.agg(max("day").as("now_day"))
      ev.crossJoin(broadcast(now))
        .withColumn("sc", expr(
          """shiftleft(CAST(round(value * 100) AS BIGINT),
             20 - CAST(least((now_day - day) DIV 7, 20L) AS INT))"""))
        .groupBy("user_id")
        .agg(round(sum("sc") / lit(1048576 * 100.0), 4).as("score"),
          count(lit(1)).as("n_events"))
        .orderBy(col("score").desc, col("user_id"))
        .limit(10)
    }),

    // ε-DP noisy release (Privacy.dpGroupCounts): per-event-type DISTINCT
    // USER counts under a total user-level budget ε = 0.6 — contribution
    // bounding ACTIVE (every user emits more than L = 2 event types; the
    // hash-priority keep decides which two count), per-count noise =
    // two-sided geometric at ε/L via the 60-bit inverse-CDF floor
    // recurrence, τ = 3 thresholding replayed (a no-op at these counts —
    // the spec pins the suppressing branch on planted sparse groups)
    "q306_dp_release" -> ((s, d) => {
      graft.ops.Privacy.dpGroupCounts(events(s, d),
          col("user_id"), col("event_type"),
          epsilonMilli = 600L, maxGroupsPerUnit = 2, tau = 3L, seed = 42)
        .orderBy("group")
    }),

    // ε-DP noisy SUMS (Privacy.dpGroupSums): per-event-type total value
    // on the half-unit grid (unitScale 2 — multiply-then-round, never
    // divide), each user's per-type total CLAMPED to 40 units before the
    // group sum (the clipping layer counts cannot need), noise at
    // α = exp(−ε/(L·clip)) — the 3327-entry table exceeds litMaxTable,
    // so this query runs the BROADCAST-join draw regime (the literal
    // regime is q306; the spec pins both regimes integer-equal)
    "q308_dp_sums" -> ((s, d) => {
      graft.ops.Privacy.dpGroupSums(events(s, d),
          col("user_id"), col("event_type"), col("value"),
          unitScale = 2L, clipUnits = 40L, epsilonMilli = 1000L,
          maxGroupsPerUnit = 2, tau = 0L, seed = 42)
        .orderBy("group")
    }),

    // ε-DP histogram over a PUBLIC bucket domain (Privacy.dpHistogram):
    // per-user value buckets round(value) clamped to [0, 10] — every
    // spine bucket gets a noisy count (empty ones too: occupancy is the
    // presence signal dpGroupCounts pays δ to suppress; a public domain
    // releases it for free), then quantile EXTRACTION as pure
    // post-processing: clamped cumulative counts, p50/p90 = first
    // bucket crossing the quantile line (spine-sized window — 11 rows,
    // never corpus rows)
    "q311_dp_histogram" -> ((s, d) => {
      val h = graft.ops.Privacy.dpHistogram(events(s, d),
        col("user_id"), round(col("value")).cast("long"), lo = 0L,
        hi = 10L, epsilonMilli = 2000L, maxGroupsPerUnit = 4, seed = 42)
      val wCum = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      h.withColumn("__pos", greatest(col("noisy_count"), lit(0L)))
        .withColumn("cum", sum("__pos").over(wCum))
        .withColumn("__tot", sum("__pos").over(wAll))
        .withColumn("p50_bucket",
          min(when(col("cum") * 2 >= col("__tot"), col("bucket")))
            .over(wAll))
        .withColumn("p90_bucket",
          min(when(col("cum") * 10 >= col("__tot") * 9, col("bucket")))
            .over(wAll))
        .select(col("bucket"), col("noisy_count"), col("cum"),
          col("p50_bucket"), col("p90_bucket"))
        .orderBy("bucket")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // identical mechanism replay: exp re-evaluated in DuckDB (micro-grid
    // rounding absorbs libm ULP), HUGEINT floor recurrence, identical
    // md5-uniform draws and hash-priority bounding
    "q306_dp_release" ->
      s"""SELECT * FROM (${graft.ops.Privacy.dpGroupCountsSql("events",
            "user_id", "event_type", epsilonMilli = 600L,
            maxGroupsPerUnit = 2, tau = 3L, seed = 42)})
         ORDER BY "group"""",

    // identical spine join + noise draw; quantiles replayed as the same
    // clamped-cumulative windows over the 11-row spine
    "q311_dp_histogram" ->
      s"""WITH h AS (${graft.ops.Privacy.dpHistogramSql("events",
            "user_id", "round(value)", lo = 0L, hi = 10L,
            epsilonMilli = 2000L, maxGroupsPerUnit = 4, seed = 42)}),
         c AS (SELECT bucket, noisy_count,
             greatest(noisy_count, 0) AS pos FROM h),
         w AS (SELECT bucket, noisy_count,
             sum(pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
               AS cum,
             sum(pos) OVER () AS tot
           FROM c)
         SELECT bucket, noisy_count, CAST(cum AS BIGINT) AS cum,
           CAST(min(CASE WHEN cum * 2 >= tot THEN bucket END) OVER ()
             AS BIGINT) AS p50_bucket,
           CAST(min(CASE WHEN cum * 10 >= tot * 9 THEN bucket END)
             OVER () AS BIGINT) AS p90_bucket
         FROM w ORDER BY bucket""",

    // identical quantize-clip-bound-sum ladder; the list-filter draw is
    // regime-free, replaying Spark's broadcast-join path here
    "q308_dp_sums" ->
      s"""SELECT * FROM (${graft.ops.Privacy.dpGroupSumsSql("events",
            "user_id", "event_type", "value", unitScale = 2L,
            clipUnits = 40L, epsilonMilli = 1000L, maxGroupsPerUnit = 2,
            tau = 0L, seed = 42)})
         ORDER BY "group"""",

    "q31_json_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
         FROM events GROUP BY 1 ORDER BY 1""",

    "q32_events_window" ->
      """SELECT date_trunc('hour', ts) AS wstart, event_type, count(*) AS n,
         round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    // two window starts per event: the 30-min bucket and the one before.
    // wstart is pure naive epoch arithmetic (never to_timestamp) so the
    // result is independent of DuckDB's session timezone.
    "q122_events_hopping" ->
      """WITH s AS (SELECT event_type, value,
           TIMESTAMP '1970-01-01 00:00:00'
             + ((epoch_us(ts) // 1800000000) * 1800) * INTERVAL 1 SECOND
             AS s0
           FROM events),
         w AS (SELECT s0 AS wstart, event_type, value FROM s
               UNION ALL
               SELECT s0 - INTERVAL 30 MINUTE, event_type, value FROM s)
         SELECT wstart, event_type, count(*) AS n,
           round(sum(value), 2) AS sum_value
         FROM w GROUP BY 1, 2 ORDER BY 1, 2""",

    "q67_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) us FROM events),
         w AS (SELECT event_type, us,
           max(CASE WHEN event_type = 'signup' THEN us END)
             OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sus
           FROM e)
         SELECT event_type, count(*) AS n, count(sus) AS n_with_signup,
           round(avg((us - sus) / 1000000.0), 4) AS avg_secs_since
         FROM w GROUP BY 1 ORDER BY 1""",

    "q76_range_join" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) us FROM events),
         hb AS (SELECT us // 3600000000 b, count(*) n FROM e GROUP BY 1),
         tot AS (SELECT count(*) t FROM e),
         nh AS (SELECT count(*) h FROM hb),
         hot AS (SELECT b FROM hb, tot, nh WHERE n * h * 5 >= t * 6),
         r AS (SELECT b * 3600000000 - 1800000000 s,
                      b * 3600000000 + 5400000000 e2 FROM hot)
         SELECT event_type, count(*) AS n_pairs,
           count(DISTINCT event_id) AS n_events
         FROM e JOIN r ON e.us >= r.s AND e.us < r.e2
         GROUP BY 1 ORDER BY 1""",

    "q33_events_sessions" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
         flagged AS (
           SELECT user_id, ms, event_id,
             CASE WHEN ms - lag(ms) OVER w > 1800000 THEN 1
                  WHEN lag(ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         sessions AS (
           SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged),
         per_session AS (
           SELECT user_id, session_id, count(*) AS session_events
           FROM sessions GROUP BY 1, 2)
         SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
           CAST(sum(session_events) AS BIGINT) AS n_events,
           CAST(max(session_events) AS BIGINT) AS max_session_events
         FROM per_session GROUP BY 1 ORDER BY 1""",

    "q204_retention_cohorts" ->
      """WITH e AS (SELECT user_id,
           (epoch_ms(ts) // 86400000) // 7 AS wk FROM events),
         c AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY 1),
         a AS (SELECT DISTINCT e.user_id, c.cw, e.wk - c.cw AS off
           FROM e JOIN c USING (user_id))
         SELECT CAST(cw AS BIGINT) AS cohort_week,
           CAST(off AS BIGINT) AS offset_weeks, count(*) AS n_users
         FROM a GROUP BY 1, 2 ORDER BY 1, 2""",

    "q205_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         t1 AS (SELECT user_id, min(us) AS t1 FROM e
           WHERE event_type = 'signup' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN t1 USING (user_id)
           WHERE event_type = 'view' AND us > t1 GROUP BY 1),
         t3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN t2 USING (user_id)
           WHERE event_type = 'purchase' AND us > t2 GROUP BY 1)
         SELECT '1_signup' AS stage, count(*) AS n FROM t1
         UNION ALL SELECT '2_view', count(*) FROM t2
         UNION ALL SELECT '3_purchase', count(*) FROM t3
         ORDER BY stage""",

    "q213_date_spine" ->
      """WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day, user_id,
           event_type, value FROM events),
         sp AS (SELECT day, count(*) AS n, round(sum(value), 2) AS sum_value
           FROM e WHERE user_id = 7 AND event_type = 'purchase' GROUP BY 1),
         b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
         spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b)
         SELECT s.day, coalesce(n, 0) AS n,
           coalesce(sum_value, 0.0) AS sum_value
         FROM spine s LEFT JOIN sp USING (day) ORDER BY day""",

    "q240_session_histogram" ->
      """WITH base AS (SELECT user_id, event_id,
           epoch_ms(ts) AS ms FROM events),
         flagged AS (SELECT user_id, event_id, ms,
             CASE WHEN lag(ms, 1) OVER (PARTITION BY user_id
                 ORDER BY ms, event_id) IS NULL THEN 1
               WHEN ms - lag(ms, 1) OVER (PARTITION BY user_id
                 ORDER BY ms, event_id) > 1800000 THEN 1
               ELSE 0 END AS new_session
           FROM base),
         sessions AS (SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged),
         per AS (SELECT user_id, session_id, count(*) AS session_events
           FROM sessions GROUP BY 1, 2)
         SELECT CAST(session_events AS BIGINT) AS session_events,
           count(*) AS n_sessions
         FROM per GROUP BY 1 ORDER BY 1""",

    "q238_windowed_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         t1 AS (SELECT user_id, min(us) AS t1 FROM e
           WHERE event_type = 'signup' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN t1 USING (user_id)
           WHERE event_type = 'view' AND us > t1
             AND us <= t1 + 3 * 86400000000 GROUP BY 1),
         t3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN t2 USING (user_id)
           WHERE event_type = 'purchase' AND us > t2
             AND us <= t2 + 7 * 86400000000 GROUP BY 1)
         SELECT '1_signup' AS stage, count(*) AS n FROM t1
         UNION ALL SELECT '2_view_3d', count(*) FROM t2
         UNION ALL SELECT '3_purchase_7d', count(*) FROM t3
         ORDER BY stage""",

    "q239_frequent_paths" ->
      """WITH seq AS (SELECT user_id, event_id, event_type,
           epoch_us(ts) AS us,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
         SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
         FROM seq WHERE e3 IS NOT NULL
         GROUP BY 1 ORDER BY n DESC, path LIMIT 10""",

    "q235_rfm_segments" ->
      """WITH e AS (SELECT user_id, value,
           epoch_ms(ts) // 86400000 AS day FROM events
           WHERE event_type = 'purchase'),
         nw AS (SELECT max(day) AS now_day FROM e),
         rfm AS (SELECT user_id,
             min(now_day - day) AS recency_days,
             count(*) AS frequency,
             round(sum(value), 2) AS monetary
           FROM e, nw GROUP BY 1),
         sc AS (SELECT user_id, recency_days, frequency, monetary,
             ntile(5) OVER (ORDER BY recency_days, user_id) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f,
             ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m
           FROM rfm)
         SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
           frequency, monetary, r, f, m,
           r * 100 + f * 10 + m AS segment
         FROM sc ORDER BY user_id""",

    "q218_transition_matrix" ->
      s"""WITH seq AS (SELECT user_id, event_id, event_type,
           epoch_us(ts) AS us,
           lead(event_type, 1) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS nxt
           FROM events),
         pairs AS (SELECT event_type AS cur, nxt, count(*) AS n
           FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2)
         SELECT cur, nxt, n,
           ${graft.ops.ExactRound.ratioRoundedSql(
             "n", "sum(n) OVER (PARTITION BY cur)", 6)} AS p
         FROM pairs ORDER BY cur, nxt""",

    "q219_conversion_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         t1 AS (SELECT user_id, min(us) AS t1 FROM e
           WHERE event_type = 'signup' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(us) AS t2, min(t1) AS t1m
           FROM e JOIN t1 USING (user_id)
           WHERE event_type = 'purchase' AND us > t1 GROUP BY 1)
         SELECT (t2 - t1m) // 86400000000 AS days_to_convert,
           count(*) AS n_users
         FROM t2 GROUP BY 1 ORDER BY 1""",

    "q217_rate_anomaly" ->
      """WITH daily AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
           count(*) AS n FROM events GROUP BY 1, 2),
         wd AS (SELECT event_type, day, n,
             count(n) OVER w AS c,
             sum(n) OVER w AS s1,
             sum(n * n) OVER w AS s2
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)),
         st AS (SELECT event_type, day, n, c,
             s1::DOUBLE / c AS mu,
             sqrt(greatest(s2::DOUBLE / c - (s1::DOUBLE / c) * (s1::DOUBLE / c),
               0.0)) AS sig
           FROM wd)
         SELECT event_type, day, n,
           round(coalesce(mu, 0.0), 4) AS mu,
           round(coalesce(sig, 0.0), 4) AS sigma,
           c >= 3 AND abs(n - mu) > 2.0 * sig AS anomaly
         FROM st ORDER BY event_type, day""",

    "q214_freshness_decay" ->
      """WITH e AS (SELECT user_id, value,
           epoch_ms(ts) // 86400000 AS day FROM events),
         nw AS (SELECT max(day) AS now_day FROM e)
         SELECT user_id,
           round(sum(CAST(round(value * 100) AS BIGINT)
               << (20 - least((now_day - day) // 7, 20)))
             / (1048576 * 100.0), 4) AS score,
           count(*) AS n_events
         FROM e, nw GROUP BY 1 ORDER BY score DESC, user_id LIMIT 10"""
  )
}
