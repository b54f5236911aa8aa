package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.ExactRound
import QueryUtil._

/** Second wave of relational surface: SQL entry point (temp views +
  * spark.sql), subqueries, percentile, pivot, grouping sets, pattern
  * matching, date arithmetic, deterministic sampling, sketch aggregates. */
object MiscQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // pass@k eval aggregation (Evaluation.passAtK, Chen et al. 2021):
    // task = source, verdict = doc_id % 3 = 0 — the unbiased estimator
    // in the paper's product form as a k-step integer fold on the nano
    // grid (the fold IS the cross-engine spec); sf0.001 puts n ≈ k at
    // the pass@10 boundary, sf0.01 exercises the deep fold
    "q309_pass_at_k" -> ((s, d) => {
      graft.ops.Evaluation.passAtK(t(s, d, "documents"),
          col("source"), col("doc_id") % 3 === 0, ks = Seq(1, 10))
        .orderBy("task")
    }),

    // Zipf-slope vocabulary profile: OLS slope of ln(count) vs ln(rank)
    // over the top-100 tokens — the one-number sanity check that a corpus
    // (or a dedup/curation output) still looks like natural language
    // (Zipf slope ≈ −1; a pipeline bug that mangles tokenization or
    // drops the head shows up immediately). Top-100 is a heap top-k
    // (TakeOrdered, no global sort); the rank window runs over those 100
    // driver-tiny rows (the q222 documented regime). Every OLS term
    // quantizes to a 1e-6 grid per row, so Σx, Σy, Σxy, Σx² are exact
    // BIGINT — the slope is ONE integer-ratio division rounded to 6
    "q248_zipf_slope" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val top = t(s, d, "documents")
        .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(100)
      val ranked = top.withColumn("r",
        row_number().over(Window.orderBy(col("cnt").desc, col("w"))))
      val x = log(col("r").cast("double"))
      val y = log(col("cnt").cast("double"))
      def u(c: org.apache.spark.sql.Column) =
        round(lit(1e6) * c).cast("long")
      ranked
        .select(u(x).as("xu"), u(y).as("yu"), u(x * y).as("xyu"),
          u(x * x).as("xxu"))
        .agg(count(lit(1)).as("n"), sum("xu").as("sx"), sum("yu").as("sy"),
          sum("xyu").as("sxy"), sum("xxu").as("sxx"))
        .select(col("n").as("n_terms"),
          // signed exact rational (Zipf slopes are negative): ExactRound
          // half-up, mirrored for the negative numerator
          ExactRound.ratioRoundedSigned(
            "n * sxy * 1000000L - sx * sy",
            "n * sxx * 1000000L - sx * sx", 6).as("zipf_slope"))
    }),

    // Heaps-law vocabulary growth: distinct-token count and total tokens
    // at doc-count checkpoints — the profile that says how fast the
    // vocabulary saturates (and budgets count-table sizes for the LM /
    // BPE stages). "First appearance" is min(doc_id) per token — one
    // partial-aggregable pass; each checkpoint is a filter against the
    // broadcast constant-size checkpoint list, never a sort or window
    "q249_vocab_growth" -> ((s, d) => {
      val s2 = s; import s2.implicits._
      val ck = Seq(10L, 50L, 100L, 500L, 1000L, 5000L).toDF("k")
      val docs = t(s, d, "documents")
      val toks = docs.select(col("doc_id"),
        explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      val vocab = toks.groupBy("w").agg(min("doc_id").as("fd"))
        .crossJoin(broadcast(ck)).filter(col("fd") < col("k"))
        .groupBy("k").agg(count(lit(1)).as("vocab"))
      docs.select(col("doc_id"),
          graft.ops.TextAnalysis.tokenCount(col("text")).as("nt"))
        .crossJoin(broadcast(ck)).filter(col("doc_id") < col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_docs"),
          sum("nt").cast("long").as("n_tokens"))
        .join(vocab, Seq("k"), "left")
        .select(col("k"), col("n_docs"), col("n_tokens"),
          coalesce(col("vocab"), lit(0L)).as("vocab"),
          ExactRound.ratioRoundedCol(coalesce(col("vocab"), lit(0L)),
            col("n_tokens"), 6).as("ttr"))
        .orderBy("k")
    }),

    // approx_count_distinct: the 100 TB-scalable sketch variant. The HLL
    // estimate itself is engine-specific, so the checkable contract is its
    // ERROR BOUND: |approx-exact|/exact <= 3×rsd (rsd=0.05 default → 15%,
    // a 3-sigma bound HLL++ holds with overwhelming probability). The
    // oracle recomputes exact and asserts the boolean — making the sketch
    // row fully hash-checkable instead of rows-only. Exact twin: q06.
    "q34_approx_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double")
            <= lit(0.15) * col("exact_parts").cast("double"))
            .as("within_rel_bound"))
        .orderBy("l_returnflag")
    }),

    // one-pass per-column dataset profile (counts, nulls, exact distinct,
    // numeric range/mean, string lengths) — the pre-training data-quality
    // report, single scan + single aggregation
    // ABC / Pareto analysis: parts classed by cumulative revenue share
    // (A ≤ 80 %, B ≤ 95 %, C rest) — the classic inventory concentration
    // report. Revenue stays in EXACT integer 1e-4-dollar units through the
    // ranking and cumulative sum; shares are one division rounded r6 and
    // the class boundaries compare on that grid. The cumsum ranks the
    // PART aggregate (entity table ≪ fact table; same note as q235)
    "q237_abc_analysis" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rcExpr = expr("CAST(round(l_extendedprice * 100) AS BIGINT) * " +
        "(100 - CAST(round(l_discount * 100) AS BIGINT))")
      val per = t(s, d, "lineitem")
        .groupBy("l_partkey").agg(sum(rcExpr).as("rc"))
      per.crossJoin(broadcast(per.agg(sum("rc").as("tot"))))
        .withColumn("cum", sum("rc").over(
          Window.orderBy(col("rc").desc, col("l_partkey"))))
        .withColumn("share",
          ExactRound.ratioRoundedCol(col("cum"), col("tot"), 6))
        .withColumn("cls", when(col("share") <= 0.8, "A")
          .when(col("share") <= 0.95, "B").otherwise("C"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_parts"), sum("rc").as("__rv"))
        .select(col("cls"), col("n_parts"),
          // 1e-4-dollar units to 2-decimal dollars: a .005 tie is live
          // on this grid too — same integer half-up
          ExactRound.ratioRoundedCol(col("__rv"), lit(10000L), 2)
            .as("revenue"))
        .orderBy("cls")
    }),

    // count-min sketch: mergeable frequency monitor over the token stream.
    // The portable hash family makes the ENTIRE sketch cross-engine
    // reproducible, so estimates are pinned exactly — not just bounded —
    // next to the exact counts and the never-undercounts guarantee
    "q203_count_min" -> ((s, d) => {
      import s.implicits._
      import graft.ops.Profiling
      val words = Seq("table", "row", "value", "scan", "fast", "slow",
        "agg", "join", "key", "window", "zzz_absent")
      val toks = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
      val sketch = Profiling.cmsBuild(toks, col("w"), depth = 4, width = 256)
      val est = Profiling.cmsEstimate(sketch, words.toDF("w"), col("w"),
        depth = 4, width = 256)
      val truth = toks.filter(col("w").isin(words: _*))
        .groupBy("w").agg(count(lit(1)).as("true_n"))
      est.join(truth, est("key") === truth("w"), "left")
        .select(col("key").as("word"),
          coalesce(col("true_n"), lit(0L)).as("true_n"), col("est"),
          (col("est") >= coalesce(col("true_n"), lit(0L))).as("ge_ok"))
        .orderBy("word")
    }),

    // KMV distinct sketch: the portable-hash alternative to q34's HLL —
    // the ESTIMATE itself is cross-engine pinned (k smallest md5 values
    // are engine-independent), next to the exact count and a relative
    // error bound; the k-smallest runs as a TakeOrdered heap, never a sort
    "q209_kmv_distinct" -> ((s, d) => {
      import graft.ops.Profiling
      val li = t(s, d, "lineitem")
      val kmv = Profiling.kmvDistinct(li, col("l_orderkey"), k = 64)
      val exact = li.agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
      kmv.crossJoin(exact)
        .select(col("n_seen"), col("est"), col("exact_distinct"),
          (abs(col("est") - col("exact_distinct")) <=
            lit(0.5) * col("exact_distinct")).as("bound_ok"))
    }),

    // grouped KMV: distinct users per event type — the per-day/source
    // cardinality monitor; per-group k-min two-phases under
    // InferWindowGroupLimit (KMV mergeability as a window group limit)
    "q210_kmv_per_group" -> ((s, d) => {
      import graft.ops.Profiling
      val ev = t(s, d, "events")
      val kmv = Profiling.kmvDistinctPerGroup(ev, col("user_id"),
        col("event_type"), k = 32)
      val exact = ev.groupBy(col("event_type").as("g2"))
        .agg(countDistinct("user_id").as("exact_distinct"))
      kmv.join(exact, col("g") === col("g2"))
        .select(col("g").as("event_type"), col("n_seen"), col("est"),
          col("exact_distinct"),
          (abs(col("est") - col("exact_distinct")) <=
            lit(0.6) * col("exact_distinct")).as("bound_ok"))
        .orderBy("event_type")
    }),

    // KMV set intersection (Beyer et al.): |purchasers ∩ planted-id set|
    // estimated from the union sketch's both-sides fraction — the "overlap
    // between two 100 TB id sets" audit; estimates pinned exactly, the
    // exact intersection alongside
    "q211_kmv_intersection" -> ((s, d) => {
      import graft.ops.Profiling
      val ev = t(s, d, "events")
      val a = ev.filter(col("event_type") === "purchase").select(col("user_id"))
      val b = ev.filter(pmod(col("user_id"), lit(3)) === 0).select(col("user_id"))
      val est = Profiling.kmvIntersection(a, col("user_id"), b, col("user_id"),
        k = 64)
      val exact = a.intersect(b).agg(count(lit(1)).as("exact_inter"))
      est.crossJoin(exact)
        .select(col("n_union_seen"), col("est_union"), col("n_both"),
          col("est_inter"), col("exact_inter"),
          (abs(col("est_inter") - col("exact_inter")) <=
            lit(0.6) * col("exact_inter")).as("bound_ok"))
    }),

    // CMS drift monitor: two release sketches (v2 drops every 10th doc and
    // doubles every 7th's text), per-word delta = est_b − est_a by sketch
    // linearity — the release-to-release token-distribution diff that
    // never rescans either corpus exactly; deltas pinned next to truth
    "q212_cms_drift" -> ((s, d) => {
      import s.implicits._
      import graft.ops.Profiling
      val words = Seq("table", "row", "value", "scan", "fast", "slow",
        "agg", "join", "key", "window")
      val docs = t(s, d, "documents")
      val v2 = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        .withColumn("text", when(pmod(col("doc_id"), lit(7)) === 0,
          concat_ws(" ", col("text"), col("text"))).otherwise(col("text")))
      def toks(df: DataFrame) =
        df.select(explode(split(col("text"), " ")).as("w"))
      def estOf(df: DataFrame, name: String) =
        Profiling.cmsEstimate(
            Profiling.cmsBuild(toks(df), col("w"), 4, 256),
            words.toDF("w"), col("w"), 4, 256)
          .select(col("key"), col("est").as(name))
      def truthOf(df: DataFrame, name: String) =
        toks(df).filter(col("w").isin(words: _*))
          .groupBy(col("w")).agg(count(lit(1)).as(name))
      estOf(docs, "est_a").join(estOf(v2, "est_b"), "key")
        .join(truthOf(docs, "true_a"), col("key") === col("w")).drop("w")
        .join(truthOf(v2, "true_b"), col("key") === col("w")).drop("w")
        .select(col("key").as("word"),
          col("est_a"), col("est_b"), (col("est_b") - col("est_a")).as("delta_est"),
          (col("true_b") - col("true_a")).as("delta_true"))
        .orderBy("word")
    }),

    "q114_profile" -> ((s, d) => {
      graft.ops.Profiling.profile(t(s, d, "lineitem"))
        .orderBy("column")
    }),

    // profile × heavy-hitters composition: per-column top-k VALUES via one
    // stacked scan + one SpaceSaving aggregation per column — the content
    // half of the data-quality report q114 shapes. Capacity (32) exceeds
    // each column's distinct count, so counts are exact (err = 0, asserted
    // via max_err in the output) and DuckDB replays them as count+rank.
    "q116_profile_topk" -> ((s, d) => {
      graft.ops.Profiling.topValues(t(s, d, "lineitem"),
          Seq("l_returnflag", "l_linestatus", "l_linenumber"), k = 5,
          capacity = 32)
        .select(col("column"), col("rank"), col("value"), col("cnt"),
          col("err"))
        .orderBy("column", "rank")
    }),

    // robust outlier census: median/MAD per order status over totalprice —
    // the corrupt-shard validation rule (mean/stddev get dragged by the
    // outliers they should flag; the median pair does not). The >3·MAD
    // boundary is a continuous-valued threshold, so the integer outlier
    // count is stable against cross-engine float noise.
    "q128_outliers" -> ((s, d) => {
      graft.ops.Profiling.outlierStats(t(s, d, "orders"),
          col("o_orderstatus"), col("o_totalprice"), k = 3.0)
        .withColumnRenamed("group", "o_orderstatus")
        .orderBy("o_orderstatus")
    }),

    // the 100 TB mode of the outlier census: approxMedian=true swaps both
    // median passes to percentile_approx (bounded GK state, mergeable
    // partials). Estimates never appear in output — instead the exact
    // median/MAD ride along (DuckDB replays them, same arithmetic as
    // q128) plus two bound booleans the oracle pins TRUE:
    //  - med_in_bound: approx median inside the exact [0.48, 0.52]
    //    quantile window (rank guarantee n/100, doubled — q118's rule);
    //  - mad_in_bound: approx MAD inside the exact deviations' window
    //    widened by δ = |approxMed − exactMed| (order statistics of
    //    |x−m'| shift ≤ δ from those of |x−m|).
    "q129_outliers_approx" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val approx = graft.ops.Profiling.outlierStats(orders,
          col("o_orderstatus"), col("o_totalprice"), k = 3.0,
          approxMedian = true, accuracy = 100)
        .select(col("group").as("__ga"), col("n"),
          col("median").as("__amed"), col("mad").as("__amad"))
      val exwin = orders
        .groupBy(col("o_orderstatus").as("__ge"))
        .agg(expr(
          "percentile(cast(o_totalprice as double), array(0.48D, 0.5D, 0.52D))")
          .as("__wx"))
      val exdev = orders.join(broadcast(exwin),
          col("o_orderstatus") === col("__ge"))
        .select(col("__ge"),
          element_at(col("__wx"), 2).as("__emed"),
          col("__wx"),
          abs(col("o_totalprice").cast("double") -
            element_at(col("__wx"), 2)).as("__ad"))
        .groupBy("__ge")
        .agg(max(col("__wx")).as("__wx"), max(col("__emed")).as("__emed"),
          expr("percentile(__ad, array(0.48D, 0.5D, 0.52D))").as("__wad"))
      approx.join(exdev, col("__ga") === col("__ge"))
        .select(col("__ga").as("o_orderstatus"), col("n"),
          round(element_at(col("__wx"), 2), 4).as("median"),
          round(element_at(col("__wad"), 2), 4).as("mad"),
          (col("__amed") >= element_at(col("__wx"), 1) - lit(1e-9) &&
            col("__amed") <= element_at(col("__wx"), 3) + lit(1e-9))
            .as("med_in_bound"),
          (col("__amad") >= element_at(col("__wad"), 1) -
              abs(col("__amed") - col("__emed")) - lit(1e-9) &&
            col("__amad") <= element_at(col("__wad"), 3) +
              abs(col("__amed") - col("__emed")) + lit(1e-9))
            .as("mad_in_bound"))
        .orderBy("o_orderstatus")
    }),

    // equi-depth histogram, exact twin: global ntile rank arithmetic is
    // deterministic cross-engine (bin populations fixed by rank; lo/hi
    // depend only on sorted values) — the oracle replays it verbatim
    "q132_histogram_eqdepth" -> ((s, d) => {
      graft.ops.Profiling.histogramEquiDepth(t(s, d, "lineitem"),
          col("l_extendedprice"), nBins = 8, approx = false)
        .select(col("bin"), col("n"),
          round(col("lo"), 2).as("lo"), round(col("hi"), 2).as("hi"))
        .orderBy("bin")
    }),

    // the 100 TB histogram mode: boundaries from one GK sketch agg
    // (equiDepthBounds). Estimates never in output — each approx boundary
    // must lie inside the exact [p−0.02, p+0.02] quantile window (rank
    // guarantee n/100, doubled — q118's rule); the exact quantile rides
    // along for DuckDB to replay.
    "q133_histogram_bounds" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val nB = 8
      val bounds = graft.ops.Profiling.equiDepthBounds(li,
        col("l_extendedprice"), nB, accuracy = 100)
      val winProbs = (1 until nB).map(_.toDouble / nB)
        .flatMap(p => Seq(p - 0.02, p, p + 0.02))
      val arr = winProbs.map(p => s"${p}D").mkString(", ")
      // r20 (guide §2.3 "aggregate before you shuffle"): the exact
      // percentile used to run over RAW rows coalesced to 4 partitions —
      // each partial buffer a value→count map over ~100k distinct prices,
      // 4-way parallelism (wall 5.1 s / cpu 10.4 at sf0.1). Collapse to
      // the distinct (value, count) table FIRST with a fully partial-
      // aggregable groupBy (map-side combine on all 32 cores), then feed
      // percentile its FREQUENCY form — identical math (a weighted
      // percentile over (v, n) IS the percentile of v repeated n times;
      // same sorted-map interpolation), ~100k rows into the final agg
      // instead of the corpus. The exact twin stays test-scale-only by
      // design (q132's scaladoc) — the shipped approx path (equiDepthBounds)
      // never builds these buffers.
      li.select(col("l_extendedprice").cast("double").as("__v"))
        .groupBy("__v").agg(count(lit(1)).as("__f"))
        .agg(expr(s"percentile(__v, array($arr), __f)").as("w"))
        .select(posexplode(typedlit(bounds)).as(Seq("i0", "ab")), col("w"))
        .select((col("i0") + 1).cast("int").as("i"),
          round(element_at(col("w"), col("i0") * 3 + 2), 4).as("exact_q"),
          (col("ab") >= element_at(col("w"), col("i0") * 3 + 1) - lit(1e-9) &&
            col("ab") <= element_at(col("w"), col("i0") * 3 + 3) + lit(1e-9))
            .as("in_window"))
        .orderBy("i")
    }),

    // pairwise numeric correlations in ONE scan (all co-moments in a
    // single agg) — the redundancy/leakage screen of a profile. r4 keeps
    // the cross-engine one-pass-co-moment noise (≪1e-9) off the grid.
    "q138_correlations" -> ((s, d) => {
      graft.ops.Profiling.correlations(t(s, d, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")
    }),

    // version-to-version drift report: two single-scan profiles joined on
    // the column name — null-rate delta, mean delta, range-breach flags
    // (the upstream-change signal between corpus snapshots)
    "q139_profile_diff" -> ((s, d) => {
      val o = t(s, d, "orders")
      graft.ops.Profiling.profileDiff(
          o.filter(col("o_orderkey") % 2 === 0),
          o.filter(col("o_orderkey") % 2 =!= 0),
          Seq("o_custkey", "o_totalprice"))
        .orderBy("column")
    }),

    // dataset release audit: keyed snapshot diff between two corpus
    // versions — v1 = docs except ids ≡5 (mod 11), v2 = docs except ≡7
    // with every 13th text edited; per-source added/removed/changed/
    // unchanged counts pinned exactly
    "q193_snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val v1 = docs.filter(pmod(col("doc_id"), lit(11)) =!= 5)
      val v2 = docs.filter(pmod(col("doc_id"), lit(11)) =!= 7)
        .select(col("doc_id"), col("source"),
          when(pmod(col("doc_id"), lit(13)) === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
      graft.ops.Profiling.snapshotDiff(
          v1, col("doc_id"), md5(col("text")), col("source"),
          v2, col("doc_id"), md5(col("text")), col("source"))
        .orderBy("grp")
    }),

    // the SQL entry point: temp views + spark.sql with a correlated EXISTS
    "q35_sql_exists" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      t(s, d, "customer").createOrReplaceTempView("v_customer")
      s.sql(
        """SELECT c_mktsegment, count(*) AS n FROM v_customer
           WHERE EXISTS (SELECT 1 FROM v_orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
           GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    "q36_percentile" -> ((s, d) => {
      // one percentile buffer serving both quantiles — two separate
      // percentile() aggs would each hold the whole group's values
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, array(0.5D, 0.9D))").as("ps"))
        .select(col("o_orderstatus"),
          round(element_at(col("ps"), 1), 4).as("p50"),
          round(element_at(col("ps"), 2), 4).as("p90"))
        .orderBy("o_orderstatus")
    }),

    // approx percentile (GK sketch): the third bound-checkable estimate
    // after HLL (q34) and SpaceSaving (q115/q116). percentile_approx with
    // accuracy=100 guarantees the returned element's RANK is within
    // n/100 of the target, so its VALUE must lie inside the exact quantile
    // window [p-0.02, p+0.02] (double the guarantee — safely monotone).
    // The exact p50 rides along; the oracle recomputes it (quantile_cont ≡
    // Spark percentile, pinned by q36) and asserts the bound TRUE.
    "q118_approx_percentile" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(100)).as("ap"),
          expr("percentile(o_totalprice, array(0.48D, 0.5D, 0.52D))").as("pb"))
        .select(col("o_orderstatus"),
          round(element_at(col("pb"), 2), 4).as("p50"),
          (col("ap") >= element_at(col("pb"), 1) &&
            col("ap") <= element_at(col("pb"), 3)).as("within_rank_bound"))
        .orderBy("o_orderstatus")
    }),

    "q37_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    }),

    "q38_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             count(*) AS n, sum(l_quantity) AS sum_qty
           FROM v_lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                   (l_returnflag, l_linestatus))
           ORDER BY flag, status""")
    }),

    "q39_string_match" -> ((s, d) => {
      t(s, d, "part")
        .filter(col("p_type").like("%ECO%") ||
          col("p_name").rlike("^(red|blue) [a-z]+$"))
        .groupBy("p_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("p_name").startsWith("small"), 1).otherwise(0))
            .cast("long").as("n_small"))
        .orderBy("p_type")
    }),

    "q52_date_arith" -> ((s, d) => {
      // order→ship latency: exact day arithmetic via date_trunc + datediff
      val li = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      val ord = t(s, d, "orders").select("o_orderkey", "o_orderdate")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(date_trunc("month", col("o_orderdate")).as("month"),
          datediff(col("l_shipdate"), col("o_orderdate")).as("lag_days"))
        .groupBy("month")
        .agg(count(lit(1)).as("n"), avg("lag_days").as("avg_lag_days"),
          max("lag_days").as("max_lag_days"))
        .orderBy("month")
    }),

    "q53_array_agg" -> ((s, d) => {
      // array aggregation exercised, scalar-projected for stable compare
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(sort_array(collect_set(col("l_linenumber"))).as("linenums"))
        .select(col("l_returnflag"), size(col("linenums")).as("n_linenums"),
          element_at(col("linenums"), 1).as("first_linenum"),
          element_at(col("linenums"), -1).as("last_linenum"))
        .orderBy("l_returnflag")
    }),

    "q54_mod_sample" -> ((s, d) => {
      // deterministic 5% sample: key-mod predicate (portable, reproducible;
      // TABLESAMPLE is engine-random and cannot be oracle-checked)
      t(s, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(20)) === 0)
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    }),

    "q55_tpch_q6" -> ((s, d) => {
      // TPC-H Q6 forecast-revenue: tight scan-filter-agg, exact cents math
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1997-01-01") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
          .cast("double") / 10000.0).as("revenue"))
    }),

    "q56_scalar_subquery" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders2")
      s.sql(
        """SELECT o_orderstatus, count(*) AS n
           FROM v_orders2
           WHERE o_totalprice > (SELECT avg(o_totalprice) FROM v_orders2)
           GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // schema-on-read over DRIFTING shards (reference worker.py:381-397):
    // shard 1 carries k as INT, shard 2 widens k to LONG and adds a column;
    // SchemaDrift.readSharded widens int→long and nulls the absent column,
    // still one FileSourceScan. The oracle recomputes over the un-split
    // source table, pinning that no row, value, or null was lost.
    "q96_schema_drift" -> ((s, d) => {
      val base = t(s, d, "nation")
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_drift_q96").getAbsolutePath
      base.filter(col("n_nationkey") < 12)
        .select(col("n_nationkey").cast("int").as("k"), col("n_regionkey").as("r"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/s1")
      base.filter(col("n_nationkey") >= 12)
        .select(col("n_nationkey").as("k"), col("n_regionkey").as("r"),
          col("n_name").as("name"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/s2")
      graft.core.SchemaDrift.readSharded(s, Seq(s"$dir/s1", s"$dir/s2"))
        .groupBy("r")
        .agg(sum("k").as("sum_k"), count(col("name")).as("n_named"),
          count(lit(1)).as("n"))
        .orderBy("r")
    }),

    // DATE-TYPE drift (round-7 lattice extension): the old producer wrote a
    // DATE column, the new one carries full timestamps — readSharded widens
    // date ⊔ timestamp to timestamp_ntz (dates midnight-expand, LTZ shards
    // read as UTC wall clock), still ONE FileSourceScan. The oracle
    // recomputes over the un-split orders table: day-truncation stands in
    // for the date shard's midnight expansion.
    "q117_drift_date" -> ((s, d) => {
      val base = t(s, d, "orders")
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_drift_q117").getAbsolutePath
      base.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey").as("k"), col("o_orderdate").cast("date").as("t"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/s1")
      base.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .select(col("o_orderkey").as("k"), col("o_orderdate").as("t"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/s2")
      graft.core.SchemaDrift.readSharded(s, Seq(s"$dir/s1", s"$dir/s2"))
        .groupBy(year(col("t")).as("yr"))
        .agg(count(lit(1)).as("n"), min("t").as("min_t"), max("t").as("max_t"))
        .orderBy("yr")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // the identical k-step integer fold (// floors = DIV truncates on
    // these non-negative intermediates), identical NULL rule at n < k
    "q309_pass_at_k" ->
      s"""SELECT * FROM (${graft.ops.Evaluation.passAtKSql("documents",
            "source", "doc_id % 3 = 0", ks = Seq(1, 10))})
         ORDER BY task""",

    // identical heap top-100, identical per-term 1e-6 quantization,
    // identical integer-ratio slope
    "q248_zipf_slope" ->
      s"""WITH tf AS (SELECT w, count(*) AS cnt FROM
           (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
           GROUP BY 1),
         top AS (SELECT w, cnt FROM tf ORDER BY cnt DESC, w LIMIT 100),
         rk AS (SELECT w, cnt,
             row_number() OVER (ORDER BY cnt DESC, w) AS r FROM top),
         u AS (SELECT
             CAST(round(1e6 * ln(r::DOUBLE)) AS BIGINT) AS xu,
             CAST(round(1e6 * ln(cnt::DOUBLE)) AS BIGINT) AS yu,
             CAST(round(1e6 * ln(r::DOUBLE) * ln(cnt::DOUBLE)) AS BIGINT) AS xyu,
             CAST(round(1e6 * ln(r::DOUBLE) * ln(r::DOUBLE)) AS BIGINT) AS xxu
           FROM rk),
         agg AS (SELECT count(*) AS n, sum(xu) AS sx, sum(yu) AS sy,
             sum(xyu) AS sxy, sum(xxu) AS sxx FROM u)
         SELECT CAST(n AS BIGINT) AS n_terms,
           ${graft.ops.ExactRound.ratioRoundedSignedSql(
             "n * sxy * 1000000 - sx * sy",
             "n * sxx * 1000000 - sx * sx", 6)} AS zipf_slope
         FROM agg""",

    // identical first-appearance rule and checkpoint filters
    "q249_vocab_growth" ->
      s"""WITH ck AS (SELECT unnest([10, 50, 100, 500, 1000, 5000]) AS k),
         tk AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w
           FROM documents),
         fs AS (SELECT w, min(doc_id) AS fd FROM tk GROUP BY 1),
         v AS (SELECT k, count(*) AS vocab FROM fs, ck WHERE fd < k
           GROUP BY 1),
         tt AS (SELECT k, count(*) AS n_docs,
             CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents, ck WHERE doc_id < k GROUP BY 1)
         SELECT CAST(tt.k AS BIGINT) AS k, tt.n_docs, tt.n_tokens,
           CAST(coalesce(v.vocab, 0) AS BIGINT) AS vocab,
           ${graft.ops.ExactRound.ratioRoundedSql(
             "coalesce(v.vocab, 0)", "tt.n_tokens", 6)} AS ttr
         FROM tt LEFT JOIN v USING (k) ORDER BY k""",

    // the estimate is engine-specific; the bound is not. TRUE is the
    // contract: Spark's side computes |approx-exact| <= 0.15*exact.
    "q34_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
         TRUE AS within_rel_bound
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // exact regime: SpaceSaving counts replay as plain count(*) + rank;
    // err is structurally 0 there, so the oracle pins it as a constant
    "q116_profile_topk" ->
      """WITH vals AS (
           SELECT 'l_returnflag' AS "column", CAST(l_returnflag AS VARCHAR) AS value
             FROM lineitem WHERE l_returnflag IS NOT NULL
           UNION ALL
           SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR)
             FROM lineitem WHERE l_linestatus IS NOT NULL
           UNION ALL
           SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR)
             FROM lineitem WHERE l_linenumber IS NOT NULL),
         cnt AS (SELECT "column", value, count(*) AS c FROM vals GROUP BY 1, 2),
         r AS (SELECT "column", value, c,
             row_number() OVER (PARTITION BY "column" ORDER BY c DESC, value) AS rn
           FROM cnt)
         SELECT "column", CAST(rn AS INT) AS rank, value, c AS cnt,
           CAST(0 AS BIGINT) AS err
         FROM r WHERE rn <= 5 ORDER BY "column", rank""",

    "q209_kmv_distinct" ->
      s"""WITH ${graft.ops.Profiling.kmvDistinctSql("l_orderkey", "lineitem", 64)},
         ex AS (SELECT count(DISTINCT l_orderkey) AS exact_distinct
           FROM lineitem)
         SELECT n_seen, est, exact_distinct,
           abs(est - exact_distinct) <= 0.5 * exact_distinct AS bound_ok
         FROM kmv, ex""",

    "q237_abc_analysis" ->
      s"""WITH per AS (SELECT l_partkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
             AS rc
           FROM lineitem GROUP BY 1),
         tot AS (SELECT CAST(sum(rc) AS BIGINT) AS tot FROM per),
         cm AS (SELECT l_partkey, rc,
             CAST(sum(rc) OVER (ORDER BY rc DESC, l_partkey) AS BIGINT)
               AS cum
           FROM per),
         cl AS (SELECT rc,
             CASE WHEN ${graft.ops.ExactRound.ratioRoundedSql(
                 "cum", "tot", 6)} <= 0.8 THEN 'A'
               WHEN ${graft.ops.ExactRound.ratioRoundedSql(
                 "cum", "tot", 6)} <= 0.95 THEN 'B'
               ELSE 'C' END AS cls
           FROM cm, tot)
         SELECT cls, count(*) AS n_parts,
           ${graft.ops.ExactRound.ratioRoundedSql(
             "sum(rc)", "10000", 2)} AS revenue
         FROM cl GROUP BY 1 ORDER BY 1""",

    "q212_cms_drift" -> {
      val words = Seq("table", "row", "value", "scan", "fast", "slow",
        "agg", "join", "key", "window")
      val vals = words.map(w => s"('$w')").mkString(", ")
      val inList = words.map(w => s"'$w'").mkString(", ")
      val tokA = "(SELECT unnest(str_split(text, ' ')) AS w FROM documents)"
      val v2 = """(SELECT doc_id, CASE WHEN doc_id % 7 = 0
        THEN text || ' ' || text ELSE text END AS text
        FROM documents WHERE doc_id % 10 <> 0)"""
      val tokB = s"(SELECT unnest(str_split(text, ' ')) AS w FROM $v2 v2i)"
      s"""WITH ${graft.ops.Profiling.cmsSql("w", tokA, "w",
          s"(VALUES $vals) pa(w)", 4, 256, tag = "ca")},
         ${graft.ops.Profiling.cmsSql("w", tokB, "w",
          s"(VALUES $vals) pb(w)", 4, 256, tag = "cb")},
         ta AS (SELECT w, count(*) AS true_a FROM $tokA x
           WHERE w IN ($inList) GROUP BY 1),
         tb AS (SELECT w, count(*) AS true_b FROM $tokB x
           WHERE w IN ($inList) GROUP BY 1)
         SELECT a.key AS word, a.est AS est_a, b.est AS est_b,
           b.est - a.est AS delta_est,
           CAST(tb.true_b - ta.true_a AS BIGINT) AS delta_true
         FROM ca_est a JOIN cb_est b ON a.key = b.key
         JOIN ta ON a.key = ta.w JOIN tb ON a.key = tb.w
         ORDER BY word"""
    },

    "q210_kmv_per_group" -> {
      val h = graft.functions.PortableHash.md5LongSql("user_id::VARCHAR", 0)
      val m = math.pow(2, 60)
      s"""WITH hs AS (SELECT DISTINCT event_type AS g, $h AS h FROM events),
         rk AS (SELECT g, h,
             row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM hs),
         ag AS (SELECT g, count(*) AS n_seen, max(h) AS hk
           FROM rk WHERE rk <= 32 GROUP BY 1),
         ex AS (SELECT event_type AS g, count(DISTINCT user_id)
             AS exact_distinct FROM events GROUP BY 1)
         SELECT ag.g AS event_type, CAST(n_seen AS BIGINT) AS n_seen,
           CASE WHEN n_seen < 32 THEN n_seen::DOUBLE
             ELSE round(31.0 * $m / hk::DOUBLE, 4) END AS est,
           exact_distinct,
           abs(CASE WHEN n_seen < 32 THEN n_seen::DOUBLE
             ELSE round(31.0 * $m / hk::DOUBLE, 4) END - exact_distinct)
             <= 0.6 * exact_distinct AS bound_ok
         FROM ag JOIN ex USING (g) ORDER BY event_type"""
    },

    "q211_kmv_intersection" ->
      s"""WITH ${graft.ops.Profiling.kmvIntersectionSql("user_id",
          "(SELECT user_id FROM events WHERE event_type = 'purchase')",
          "user_id", "(SELECT user_id FROM events WHERE user_id % 3 = 0)",
          64)},
         ex AS (SELECT count(*) AS exact_inter FROM (
           SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
           INTERSECT
           SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0))
         SELECT n_union_seen, est_union, n_both, est_inter,
           CAST(exact_inter AS BIGINT) AS exact_inter,
           abs(est_inter - exact_inter) <= 0.6 * exact_inter AS bound_ok
         FROM kmv_inter, ex""",

    "q203_count_min" -> {
      val words = Seq("table", "row", "value", "scan", "fast", "slow",
        "agg", "join", "key", "window", "zzz_absent")
      val vals = words.map(w => s"('$w')").mkString(", ")
      val inList = words.map(w => s"'$w'").mkString(", ")
      s"""WITH ${graft.ops.Profiling.cmsSql("w",
          "(SELECT unnest(str_split(text, ' ')) AS w FROM documents)",
          "w", s"(VALUES $vals) pt(w)", 4, 256)},
         truth AS (SELECT w, count(*) AS true_n
           FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
           WHERE w IN ($inList) GROUP BY 1)
         SELECT key AS word, coalesce(true_n, 0) AS true_n, est,
           est >= coalesce(true_n, 0) AS ge_ok
         FROM cms_est LEFT JOIN truth ON key = w ORDER BY word"""
    },

    "q114_profile" -> {
      import graft.ops.Profiling.profileRowSql
      val rows = Seq(
        "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
        "l_linenumber" -> "num", "l_quantity" -> "num",
        "l_extendedprice" -> "num", "l_discount" -> "num", "l_tax" -> "num",
        "l_returnflag" -> "str", "l_linestatus" -> "str",
        "l_shipdate" -> "ts")
        .map { case (c, k) => profileRowSql("lineitem", c, k) }
        .mkString("\n UNION ALL\n ")
      s"""SELECT * FROM (\n $rows\n) ORDER BY "column""""
    },

    "q35_sql_exists" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q36_percentile" ->
      """SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         round(quantile_cont(o_totalprice, 0.9), 4) AS p90
         FROM orders GROUP BY 1 ORDER BY 1""",

    // same two-stage median/MAD arithmetic; quantile_cont ≡ Spark
    // percentile is pinned by q36
    "q128_outliers" ->
      """WITH m AS (SELECT o_orderstatus g, quantile_cont(o_totalprice, 0.5) med
           FROM orders GROUP BY 1),
         d AS (SELECT g, med, o_totalprice x, abs(o_totalprice - med) ad
           FROM orders JOIN m ON o_orderstatus = g),
         m2 AS (SELECT g, quantile_cont(ad, 0.5) mad FROM d GROUP BY 1)
         SELECT d.g AS o_orderstatus, count(*) AS n,
           round(max(d.med), 4) AS median,
           round(max(m2.mad), 4) AS mad,
           CAST(sum(CASE WHEN d.ad > 3.0 * m2.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
         FROM d JOIN m2 ON d.g = m2.g
         GROUP BY 1 ORDER BY 1""",

    // approx-mode census: exact median/MAD replayed (q128's arithmetic),
    // sketch values reduced to their rank-error bounds, pinned TRUE
    "q129_outliers_approx" ->
      """WITH m AS (SELECT o_orderstatus g, quantile_cont(o_totalprice, 0.5) med
           FROM orders GROUP BY 1),
         d AS (SELECT g, med, abs(o_totalprice - med) ad
           FROM orders JOIN m ON o_orderstatus = g)
         SELECT g AS o_orderstatus, count(*) AS n,
           round(max(med), 4) AS median,
           round(quantile_cont(ad, 0.5), 4) AS mad,
           TRUE AS med_in_bound, TRUE AS mad_in_bound
         FROM d GROUP BY 1 ORDER BY 1""",

    "q138_correlations" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val rows = (for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
           round(corr(CAST(${cols(i)} AS DOUBLE), CAST(${cols(j)} AS DOUBLE)), 4) AS corr
           FROM lineitem""").mkString(" UNION ALL ")
      s"SELECT * FROM ($rows) ORDER BY col_a, col_b"
    },

    // identical slices/edit plant; the diff replayed as the same full
    // outer join on the key with md5 content compares
    "q193_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, source, md5(text) AS f
           FROM documents WHERE doc_id % 11 <> 5),
         v2 AS (SELECT doc_id, source,
             md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
               ELSE text END) AS f
           FROM documents WHERE doc_id % 11 <> 7),
         st AS (SELECT coalesce(v2.source, v1.source) AS grp,
             CASE WHEN v1.f IS NULL THEN 'added'
               WHEN v2.f IS NULL THEN 'removed'
               WHEN v1.f <> v2.f THEN 'changed'
               ELSE 'unchanged' END AS s
           FROM v1 FULL OUTER JOIN v2 USING (doc_id))
         SELECT grp,
           CAST(sum(CASE WHEN s = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(sum(CASE WHEN s = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN s = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(sum(CASE WHEN s = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
         FROM st GROUP BY 1 ORDER BY 1""",

    // the deltas replay profile's own arithmetic: per-side rounded means
    // re-rounded on subtraction, the null-rate delta as the identical
    // exact signed rational (r16 — round over a DIFFERENCE of integer
    // quotients is the q169 half-tie class), double compares
    "q139_profile_diff" -> {
      def one(nm: String) =
        s"""SELECT '$nm' AS "column", a.n AS n_rows_a, b.n AS n_rows_b,
           ${graft.ops.ExactRound.ratioRoundedSignedSql(
          s"b.null_$nm * a.n - a.null_$nm * b.n", "b.n * a.n", 6)}
             AS null_rate_delta,
           round(b.mean_$nm - a.mean_$nm, 4) AS mean_delta,
           b.min_$nm < a.min_$nm AS min_breach,
           b.max_$nm > a.max_$nm AS max_breach
           FROM a, b"""
      val aggCols = Seq("o_custkey", "o_totalprice").map(nm =>
        s"""count(*) FILTER ($nm IS NULL) AS null_$nm,
           CAST(min($nm) AS DOUBLE) AS min_$nm,
           CAST(max($nm) AS DOUBLE) AS max_$nm,
           round(avg(CAST($nm AS DOUBLE)), 4) AS mean_$nm""").mkString(", ")
      s"""WITH agg AS (SELECT o_orderkey % 2 = 0 AS is_a, count(*) AS n,
           $aggCols FROM orders GROUP BY 1),
         a AS (SELECT * FROM agg WHERE is_a),
         b AS (SELECT * FROM agg WHERE NOT is_a)
         SELECT * FROM (${one("o_custkey")} UNION ALL ${one("o_totalprice")})
         ORDER BY "column""""
    },

    "q132_histogram_eqdepth" ->
      """WITH b AS (SELECT ntile(8) OVER (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS bin,
           CAST(l_extendedprice AS DOUBLE) AS x
           FROM lineitem WHERE l_extendedprice IS NOT NULL)
         SELECT CAST(bin AS INT) AS bin, count(*) AS n,
           round(min(x), 2) AS lo, round(max(x), 2) AS hi
         FROM b GROUP BY 1 ORDER BY 1""",

    "q133_histogram_bounds" -> {
      val probs = (1 until 8).map(i => (i.toDouble / 8).toString).mkString(", ")
      s"""WITH q AS (SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE),
           [$probs]) AS qs FROM lineitem),
         i AS (SELECT unnest(generate_series(1, 7)) AS i)
         SELECT CAST(i AS INT) AS i, round(qs[i], 4) AS exact_q,
           TRUE AS in_window
         FROM i, q ORDER BY i"""
    },

    // the sketch value is engine-specific; its rank-error bound is not
    "q118_approx_percentile" ->
      """SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         TRUE AS within_rank_bound
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q37_pivot" ->
      """SELECT o_orderpriority,
         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
         count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q38_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
         coalesce(l_linestatus, 'ALL') AS status,
         count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                 (l_returnflag, l_linestatus))
         ORDER BY flag, status""",

    "q39_string_match" ->
      """SELECT p_type, count(*) AS n,
         CAST(sum(CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END) AS BIGINT) AS n_small
         FROM part
         WHERE p_type LIKE '%ECO%' OR regexp_full_match(p_name, '(red|blue) [a-z]+')
         GROUP BY 1 ORDER BY 1""",

    "q52_date_arith" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, count(*) AS n,
         avg(date_diff('day', o_orderdate, l_shipdate)) AS avg_lag_days,
         CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS INT) AS max_lag_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",

    "q53_array_agg" ->
      """WITH a AS (SELECT l_returnflag,
           list_sort(list(DISTINCT l_linenumber)) AS linenums
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, CAST(len(linenums) AS INT) AS n_linenums,
           linenums[1] AS first_linenum, linenums[-1] AS last_linenum
         FROM a ORDER BY l_returnflag""",

    "q54_mod_sample" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders WHERE o_orderkey % 20 = 0""",

    "q55_tpch_q6" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
           / 10000.0 AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""",

    "q56_scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n
         FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // the drift split is n_nationkey < 12 vs >= 12; `name` exists only in
    // the second shard, so count(name) counts exactly the >= 12 rows
    "q96_schema_drift" ->
      """SELECT n_regionkey AS r, CAST(sum(n_nationkey) AS BIGINT) AS sum_k,
         count(CASE WHEN n_nationkey >= 12 THEN n_name END) AS n_named,
         count(*) AS n
         FROM nation GROUP BY 1 ORDER BY 1""",

    // even keys came from the DATE shard → midnight-truncated; odd keys
    // kept their full timestamp
    "q117_drift_date" ->
      """WITH u AS (SELECT o_orderkey AS k,
           CAST(CASE WHEN o_orderkey % 2 = 0
                THEN date_trunc('day', o_orderdate)
                ELSE o_orderdate END AS TIMESTAMP) AS t
           FROM orders)
         SELECT CAST(year(t) AS INT) AS yr, count(*) AS n,
           min(t) AS min_t, max(t) AS max_t
         FROM u GROUP BY 1 ORDER BY 1"""
  )
}
