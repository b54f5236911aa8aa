package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash

/** Dataset profiling: per-column statistics (row/null/distinct counts,
  * numeric range and mean, string length range) computed in ONE aggregation
  * pass over ONE scan — the pre-training data-quality report every pipeline
  * runs, shaped so it stays cheap at 100 TB.
  *
  * Scale notes: all non-distinct aggregates go into a single `agg(...)` so
  * the scan happens once and every statistic partial-aggregates map-side;
  * the result is one driver row reshaped to per-column rows by a
  * literal-bounded inline (no shuffle of data rows). Exact `n_distinct`
  * deliberately does NOT use multi-column `count(DISTINCT)` — Catalyst
  * plans that as an Expand that multiplies EVERY aggregate's input by the
  * column count (measured 9.6 s vs 1 s at sf0.1). Instead values stack to
  * `(column, value)` pairs feeding one grouped distinct-count — map-side
  * partials shrink the shuffle to ~|vocab| rows per column, and the
  * 1-row-per-column result broadcast-joins back. `approxDistinct = true`
  * replaces that second pass with per-column HLL sketches inside the first
  * one (one scan total) — the 100 TB default.
  *
  * Stat typing is deliberately engine-portable (numerics as DOUBLE, string
  * stats on codepoint lengths, counts as LONG) so a DuckDB oracle can
  * recompute every cell bit-exactly; engine-specific type names are NOT
  * part of the output for the same reason.
  */
object Profiling {

  /** Per-column profile of `df` (all columns, or `cols` if given):
    * `(column, n_rows, n_null, n_distinct, min_num, max_num, mean_num,
    * min_len, max_len)`. Numeric stats are null for non-numeric columns,
    * length stats null for non-strings; timestamps profile as epoch
    * SECONDS in the numeric slots (integer-exact for whole-second data).
    * `mean_num` is rounded to 4 decimals (cross-engine summation noise ≪
    * the grid; counts/min/max are exact). */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
      approxDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields.filter(f => cols.isEmpty || cols.contains(f.name))
    require(fields.nonEmpty, "profile: no matching columns")

    def numericOf(f: StructField): Option[Column] = f.dataType match {
      case _: NumericType => Some(col(f.name).cast("double"))
      // NTZ casts through LTZ in the session timezone (UTC), matching the
      // oracle's naive epoch() reading of the same parquet
      case _: TimestampType | _: TimestampNTZType =>
        Some(unix_timestamp(col(f.name).cast(TimestampType)).cast("double"))
      case _ => None
    }

    val aggs: Seq[Column] = fields.toIndexedSeq.flatMap { f =>
      val c = col(f.name)
      val nm = f.name
      val num = numericOf(f)
      val len = f.dataType match {
        case StringType => Some(length(c))
        case _ => None
      }
      Seq(
        count(lit(1)).as(s"__n_$nm"),
        count(when(c.isNull, 1)).as(s"__null_$nm")) ++
      (if (approxDistinct) Seq(approx_count_distinct(c).as(s"__dist_$nm"))
       else Nil) ++
      Seq(
        num.map(min).getOrElse(lit(null).cast("double")).as(s"__min_$nm"),
        num.map(max).getOrElse(lit(null).cast("double")).as(s"__max_$nm"),
        num.map(n => round(avg(n), 4)).getOrElse(lit(null).cast("double"))
          .as(s"__mean_$nm"),
        len.map(l => min(l).cast("int")).getOrElse(lit(null).cast("int"))
          .as(s"__minlen_$nm"),
        len.map(l => max(l).cast("int")).getOrElse(lit(null).cast("int"))
          .as(s"__maxlen_$nm"))
    }

    val one = df.agg(aggs.head, aggs.tail: _*)
    // reshape the single wide row to per-column rows: a literal-bounded
    // inline of per-column structs — runs on the one aggregated row, so it
    // is driver-cheap regardless of input size
    val rows = fields.toIndexedSeq.map { f =>
      val nm = f.name
      struct(lit(nm).as("column"),
        col(s"__n_$nm").as("n_rows"), col(s"__null_$nm").as("n_null"),
        (if (approxDistinct) col(s"__dist_$nm") else lit(null).cast("long"))
          .as("n_distinct"),
        col(s"__min_$nm").as("min_num"), col(s"__max_$nm").as("max_num"),
        col(s"__mean_$nm").as("mean_num"),
        col(s"__minlen_$nm").as("min_len"), col(s"__maxlen_$nm").as("max_len"))
    }
    val stats = one.select(inline(array(rows: _*)))
    if (approxDistinct) return stats

    // exact distinct counts, Expand-free: stack to (column, value) pairs
    // and count per column in grouped aggregates whose map-side partials
    // carry ~|vocab| rows, not the table. One stack PER DATA TYPE, unioned:
    // values keep their native type (no row-by-row string formatting), and
    // each branch's scan prunes to exactly its own columns — total bytes
    // read match the single-scan form
    val dist = fields.groupBy(_.dataType).toSeq.map { case (_, fs) =>
      df.select(inline(array(fs.toIndexedSeq.map(f =>
          struct(lit(f.name).as("column"), col(f.name).as("__v"))): _*)))
        .groupBy("column").agg(countDistinct(col("__v")).as("__nd"))
    }.reduce(_ unionAll _)
    // LEFT join + coalesce: a zero-row input has no pairs at all, and the
    // contract is per-column rows with n_rows = 0, not an empty report
    stats.drop("n_distinct")
      .join(broadcast(dist), Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_null"),
        coalesce(col("__nd"), lit(0L)).as("n_distinct"),
        col("min_num"), col("max_num"), col("mean_num"),
        col("min_len"), col("max_len"))
  }

  /** Per-column top-k VALUES — the other half of every data-quality report
    * ([[profile]] gives the shape of each column, this gives its dominant
    * content). Composition of the profile's stacked `(column, value)` pair
    * shape with [[TextAnalysis.heavyHitters]]: one scan stacks the requested
    * columns (values cast to string for a uniform report schema, nulls
    * dropped — they are already counted by `profile`), then ONE SpaceSaving
    * aggregation per column bounds memory at `capacity` counters regardless
    * of column cardinality. With capacity ≥ each column's per-partition
    * distinct count the counts are exact (err = 0) — the oracle-checkable
    * regime; under pressure they degrade to bounded-error estimates instead
    * of failing. Output: (column, rank, value, cnt, err), rank 1..k by
    * (cnt DESC, value ASC). */
  def topValues(df: DataFrame, cols: Seq[String], k: Int,
      capacity: Int): DataFrame = {
    require(cols.nonEmpty, "topValues: no columns requested")
    val pairs = df.select(inline(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("__v"))): _*)))
      .where(col("__v").isNotNull)
    TextAnalysis.heavyHitters(pairs, col("column"), col("__v"), capacity, k)
      .select(col("grp").as("column"), col("rank"),
        col("term").as("value"), col("cnt"), col("err"))
  }

  /** Robust per-group outlier census: median / MAD (median absolute
    * deviation) and the count of points with |x − median| > k·MAD — the
    * data-validation rule that survives corrupt shards, where mean/stddev
    * get dragged by the very outliers they should flag. Two grouped
    * median aggregations (each one shuffle of map-side partial buffers)
    * with the per-group medians broadcast back between them; the scan is
    * read twice but nothing wide ever shuffles. NULL groups are a group
    * (null-safe `<=>` joins — plain `===` would silently drop them from
    * the census).
    *
    * `approxMedian = true` is the 100 TB default: both median passes use
    * `percentile_approx` (Greenwald–Khanna), whose per-group state is
    * bounded by `accuracy` and whose partials merge map-side — where the
    * exact `percentile` buffers a value→count map per group, O(distinct
    * values) executor memory on a continuous column. The sketch guarantee
    * is on RANK: the returned element's rank is within n/accuracy of the
    * target, so the approx median lies inside the exact
    * [0.5−2ε, 0.5+2ε]-quantile value window (ε = 1/accuracy), and the
    * approx MAD inside the deviations' window widened by
    * δ = |approxMed − exactMed| (|x−m'|−|x−m| ≤ |m'−m| pointwise, so
    * order statistics shift by ≤ δ). q129 pins both bounds against the
    * DuckDB exact twin; exact mode stays as the oracle twin (q128). */
  def outlierStats(df: DataFrame, group: Column, x: Column,
      k: Double = 3.0, approxMedian: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    def median(c: Column): Column =
      if (approxMedian) percentile_approx(c, lit(0.5), lit(accuracy))
      else org.apache.spark.sql.functions.median(c)
    val base = df.select(group.as("__g"), x.cast("double").as("__x"))
    val med = base.groupBy("__g")
      .agg(median(col("__x")).as("__med"))
      .withColumnRenamed("__g", "__g2")
    val dev = base.join(broadcast(med), col("__g") <=> col("__g2"))
      .select(col("__g"), col("__x"), col("__med"),
        abs(col("__x") - col("__med")).as("__ad"))
    val mad = dev.groupBy(col("__g").as("__g3"))
      .agg(median(col("__ad")).as("__mad"))
    dev.join(broadcast(mad), col("__g") <=> col("__g3"))
      .groupBy(col("__g").as("group"))
      .agg(count(lit(1)).as("n"),
        round(max(col("__med")), 4).as("median"),
        round(max(col("__mad")), 4).as("mad"),
        sum(when(col("__ad") > lit(k) * col("__mad"), 1).otherwise(0))
          .cast("long").as("n_outliers"))
  }

  /** Approximate equi-depth bin boundaries: the (nBins−1) inner quantiles
    * of `x` from ONE `percentile_approx` (Greenwald–Khanna) aggregation —
    * bounded sketch state, map-side-mergeable partials, rank guarantee
    * n/accuracy per boundary. Driver-sized by definition (nBins doubles). */
  def equiDepthBounds(df: DataFrame, x: Column, nBins: Int,
      accuracy: Int = 10000): Seq[Double] = {
    require(nBins > 1, s"nBins must be > 1, got $nBins")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val r = df.select(x.cast("double").as("__x")).where(col("__x").isNotNull)
      .agg(percentile_approx(col("__x"), typedlit(probs), lit(accuracy))).head
    if (r.isNullAt(0)) Nil else r.getSeq[Double](0)
  }

  /** Equi-depth (equi-height) histogram of a numeric column: `nBins`
    * buckets of ~equal row count with per-bucket lo/hi/n — the profiling
    * shape that stays informative on skewed distributions where equi-width
    * buckets collapse into one hot bar.
    *
    * `approx = true` is the 100 TB default: boundaries from
    * [[equiDepthBounds]] (one bounded-state sketch agg), then one narrow
    * pass assigns `bin = 1 + #{boundaries < x}` — a codegen'd array scan
    * over a literal — and a hash agg counts each bin. Nothing wide ever
    * shuffles and no global sort exists. Per-bin counts deviate from n/nBins
    * by at most the sketch's rank error PLUS the size of any tie run
    * straddling a boundary (ties are indivisible under value-based
    * assignment — an inherent property of every value-bucketed histogram,
    * not of the sketch).
    *
    * `approx = false` is the exact oracle twin: a global
    * `ntile(nBins) OVER (ORDER BY x)`, which funnels the sort through ONE
    * task — test-scale only, kept because its output is deterministic
    * cross-engine (bin populations are fixed by rank arithmetic, and
    * lo/hi depend only on the sorted VALUES, so ties need no tie-break). */
  def histogramEquiDepth(df: DataFrame, x: Column, nBins: Int,
      approx: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(nBins > 1, s"nBins must be > 1, got $nBins")
    val base = df.select(x.cast("double").as("__x")).where(col("__x").isNotNull)
    val binned =
      if (approx) {
        val bl = typedlit(equiDepthBounds(df, x, nBins, accuracy))
        base.withColumn("__bin",
          size(filter(bl, b => b < col("__x"))) + 1)
      } else {
        import org.apache.spark.sql.expressions.Window
        base.withColumn("__bin", ntile(nBins).over(Window.orderBy(col("__x"))))
      }
    binned.groupBy(col("__bin").as("bin"))
      .agg(count(lit(1)).as("n"), min("__x").as("lo"), max("__x").as("hi"))
      .orderBy("bin")
  }

  /** Drift report between two dataset versions sharing a schema —
    * yesterday's snapshot vs today's ingest, per column: both row counts,
    * null-RATE delta (rates, not raw counts: the versions differ in size
    * by design), mean delta, and min/max range breach flags (a new value
    * outside the old observed range is the classic upstream-change
    * signal). Two single-scan [[profile]] passes joined on the column
    * name; the join input is k rows (k = column count), so everything
    * after the scans is driver-cheap at any data size. */
  def profileDiff(before: DataFrame, after: DataFrame,
      cols: Seq[String] = Nil): DataFrame = {
    def side(df: DataFrame, tag: String) =
      profile(df, cols).select(col("column"),
        col("n_rows").as(s"n_rows_$tag"),
        col("n_null").as(s"n_null_$tag"),
        col("min_num").as(s"min_$tag"), col("max_num").as(s"max_$tag"),
        col("mean_num").as(s"mean_$tag"))
    // null-rate delta as ONE exact signed rational — round(nb/rb − na/ra)
    // rounds an IEEE difference of two integer quotients whose exact
    // half-ties flip across engines (the q169 class; the r16 census
    // widening caught this live). nb·ra − na·rb over rb·ra is the same
    // value with integer-exact numerator and denominator.
    side(before, "a").join(side(after, "b"), "column")
      .select(col("column"), col("n_rows_a"), col("n_rows_b"),
        ExactRound.ratioRoundedSigned(
          "n_null_b * n_rows_a - n_null_a * n_rows_b",
          "n_rows_b * n_rows_a", 6).as("null_rate_delta"),
        round(col("mean_b") - col("mean_a"), 4).as("mean_delta"),
        (col("min_b") < col("min_a")).as("min_breach"),
        (col("max_b") > col("max_a")).as("max_breach"))
  }

  /** Keyed SNAPSHOT diff between two corpus versions — the audit table a
    * dataset release ships next to its manifest: per group, how many
    * documents were ADDED (key only in v2), REMOVED (only in v1), CHANGED
    * (both, different content fingerprint) and UNCHANGED. One full outer
    * hash join on the document key (co-partitioned — neither snapshot is
    * assumed broadcastable) followed by one partial-aggregable count
    * rollup; the fingerprints travel instead of the texts, so the join
    * carries two hashes per key, never the corpus. The group of an
    * added/changed/unchanged doc comes from v2, a removed doc's from v1. */
  def snapshotDiff(v1: DataFrame, id1: Column, fp1: Column, g1: Column,
      v2: DataFrame, id2: Column, fp2: Column, g2: Column): DataFrame = {
    val a = v1.select(id1.as("__k"), fp1.as("__f1"), g1.as("__g1"))
    val b = v2.select(id2.as("__k"), fp2.as("__f2"), g2.as("__g2"))
    a.join(b, Seq("__k"), "full_outer")
      .select(coalesce(col("__g2"), col("__g1")).as("grp"),
        when(col("__f1").isNull, "added")
          .when(col("__f2").isNull, "removed")
          .when(col("__f1") =!= col("__f2"), "changed")
          .otherwise("unchanged").as("__st"))
      .groupBy("grp")
      .agg(
        sum(when(col("__st") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__st") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__st") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("__st") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }

  /** Pairwise Pearson correlations over numeric columns — the
    * feature-redundancy / leakage screen of a dataset profile. ONE
    * aggregation pass computes every pair's co-moments simultaneously
    * (k·(k−1)/2 `corr` aggregates share the scan and partial-merge
    * map-side); emitted long-form `(col_a, col_b, corr)`, a < b. At 100 TB
    * this is a single map-side-combinable scan — never a per-pair job. */
  /** Count-min sketch over a key column — the mergeable frequency-
    * estimation sketch (Cormode & Muthukrishnan 2005): `depth` hash rows ×
    * `width` counters; every occurrence of key `x` increments cell
    * `(r, h_r(x) mod width)` for each row r. Returns the sketch as a
    * DataFrame of `(row, cell, cnt)` — a partial-aggregable groupBy-sum
    * (the fan-out is the constant `depth`), so sketches of shards union +
    * re-sum into the corpus sketch, the property that makes CMS the
    * standard distributed frequency monitor. The hash family is the
    * portable seeded chain ([[graft.functions.PortableHash]]), so the
    * whole sketch — not just an error bound — is cross-engine
    * reproducible: estimates are pure functions of the data.
    *
    * Scale shape: one explode-free pass when `key` is already one row per
    * occurrence; sketch size `depth·width` is driver-tiny regardless of
    * corpus size; point lookups broadcast the probe keys. */
  def cmsBuild(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad depth/width: $depth/$width")
    val base = PortableHash.baseHash(key.cast("string"))
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("row"),
        pmod(PortableHash.derivedHash(base, r), lit(width.toLong)).as("cell"))): _*)
    df.select(explode(cells).as("rc"))
      .select(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .groupBy("row", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[cmsBuild]] sketch: for each probe
    * key, `min` over the sketch's `depth` cells it hashes to — the CMS
    * upper-bound estimate (never under-counts; over-counts by collision
    * mass ≤ N/width per row, min-reduced across rows). The broadcast hint
    * rides on the SKETCH: it is `depth·width`-bounded BY CONSTRUCTION
    * regardless of corpus size, while the probe side may be arbitrarily
    * large — and Spark cannot broadcast the left (probe) side of a left
    * outer join anyway, so a left-side hint is silently ignored and at
    * production depth·width the join would degrade to sort-merge once
    * the sketch outgrew the auto-broadcast threshold. Returns (key, est). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    val base = PortableHash.baseHash(key.cast("string"))
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("row"),
        pmod(PortableHash.derivedHash(base, r), lit(width.toLong)).as("cell"))): _*)
    val probeCells = probes.select(key.as("key"), explode(cells).as("rc"))
      .select(col("key"), col("rc.row").as("row"), col("rc.cell").as("cell"))
    probeCells
      .join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** DuckDB twin of the [[cmsBuild]]→[[cmsEstimate]] chain as CTE list (no
    * leading WITH): relation `${tag}_est(key, est)` for the probe keys of
    * `probeTable.$probeCol`, sketching `table.$keyCol`. Distinct `tag`s
    * let two sketch chains (e.g. two snapshots) share one oracle. */
  def cmsSql(keyCol: String, table: String, probeCol: String,
      probeTable: String, depth: Int, width: Int,
      tag: String = "cms"): String = {
    def cellsOf(c: String) = (0 until depth).map { r =>
      val h = PortableHash.derivedHashSql(PortableHash.baseHashSql(c), r)
      s"($r, ($h) % $width)"
    }.mkString(", ")
    s"""__${tag}_occ AS (SELECT $keyCol AS k FROM $table),
       __${tag}_cells AS (SELECT x.r AS row, x.c AS cell
         FROM __${tag}_occ, LATERAL (VALUES ${cellsOf("k")}) x(r, c)),
       __$tag AS (SELECT row, cell, count(*) AS cnt FROM __${tag}_cells
         GROUP BY 1, 2),
       __${tag}_probe AS (SELECT $probeCol AS key FROM $probeTable),
       __${tag}_pc AS (SELECT key, x.r AS row, x.c AS cell
         FROM __${tag}_probe, LATERAL (VALUES ${cellsOf("key")}) x(r, c)),
       ${tag}_est AS (SELECT key, min(coalesce(cnt, 0)) AS est
         FROM __${tag}_pc LEFT JOIN __$tag USING (row, cell) GROUP BY 1)"""
  }

  /** KMV (k-minimum-values) distinct-count sketch — the PORTABLE
    * alternative to HLL (`approx_count_distinct`, q34): with hashes from
    * the portable md5 family, the k smallest distinct hash values — and
    * therefore the estimate `(k−1)·M / h_(k)` (M = 2⁶⁰ hash space) — are
    * identical in every engine, so the ESTIMATE itself is oracle-pinnable,
    * not just its error bound. Fewer than k distinct values → the sketch
    * holds them all and the answer is exact (the KMV small-cardinality
    * convention). Returns one row `(n_seen, est)`; `n_seen` = values in
    * the sketch (= k when saturated). Standard error ≈ 1/√(k−2).
    *
    * Scale shape: distinct-by-hash partial-aggregates; the k-smallest is a
    * `TakeOrderedAndProject` heap (per-partition k-mins merge on the
    * driver — KMV's mergeability IS this), never a global sort; the
    * finishing agg sees k rows. */
  def kmvDistinct(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val M = math.pow(2, 60) // md5Long range — exact as a double
    val mins = df.select(PortableHash.md5Long(key.cast("string"), 0).as("h"))
      .distinct().orderBy("h").limit(k)
    mins.agg(count(lit(1)).as("n_seen"), max("h").as("__hk"))
      .select(col("n_seen"),
        when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * M /
            col("__hk").cast("double"), 4)).as("est"))
  }

  /** DuckDB twin of [[kmvDistinct]] as CTE list (no leading WITH) ending
    * in `kmv(n_seen, est)`. */
  def kmvDistinctSql(keyCol: String, table: String, k: Int): String = {
    val h = PortableHash.md5LongSql(s"$keyCol::VARCHAR", 0)
    s"""__kmv_m AS (SELECT DISTINCT $h AS h FROM $table ORDER BY h LIMIT $k),
       kmv AS (SELECT CAST(count(*) AS BIGINT) AS n_seen,
           CASE WHEN count(*) < $k THEN count(*)::DOUBLE
             ELSE round(${(k - 1).toDouble} * ${math.pow(2, 60)} /
               max(h)::DOUBLE, 4) END AS est
         FROM __kmv_m)"""
  }

  /** Per-group [[kmvDistinct]] — distinct cardinality per key group (the
    * "distinct users per day/source" monitor). The per-group k-min is a
    * `row_number ≤ k` that two-phases under InferWindowGroupLimit (map
    * tasks keep only their local k-mins — KMV mergeability expressed as a
    * window group limit), then one k-row-per-group agg. Returns
    * `(group, n_seen, est)` with the same exact-below-k convention. */
  def kmvDistinctPerGroup(df: DataFrame, key: Column, group: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val M = math.pow(2, 60)
    df.select(group.as("g"),
        PortableHash.md5Long(key.cast("string"), 0).as("h"))
      .distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("h"))))
      .filter(col("rk") <= k)
      .groupBy("g")
      .agg(count(lit(1)).as("n_seen"), max("h").as("__hk"))
      .select(col("g"), col("n_seen"),
        when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * M /
            col("__hk").cast("double"), 4)).as("est"))
  }

  /** KMV set-operation estimate: |A ∩ B| from the two key sets' sketches
    * (Beyer et al. 2007) — the scale answer to "how many ids appear in
    * BOTH splits/snapshots" when neither side fits anywhere: take the k
    * minimum hash values of A ∪ B, count how many of those belong to both
    * sides, and scale the union estimate by that fraction:
    *
    *   est_inter = (n_both / n_union_seen) · est(A ∪ B)
    *
    * Everything is portable-hash deterministic, so both estimates pin
    * exactly cross-engine. Returns one row `(n_union_seen, est_union,
    * n_both, est_inter)`; exact when the union has < k distinct keys.
    * Scale shape: two distinct-by-hash partial aggs, one heap k-min, two
    * semi joins of k rows against the (bounded, distinct-hash) sides. */
  def kmvIntersection(a: DataFrame, keyA: Column, b: DataFrame, keyB: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val ha = a.select(PortableHash.md5Long(keyA.cast("string"), 0).as("h"))
      .distinct()
    val hb = b.select(PortableHash.md5Long(keyB.cast("string"), 0).as("h"))
      .distinct()
    val mins = ha.union(hb).distinct().orderBy("h").limit(k)
    val both = mins.join(ha, Seq("h"), "leftsemi").join(hb, Seq("h"), "leftsemi")
    val u = mins.agg(count(lit(1)).as("n_union_seen"), max("h").as("__hk"))
      .crossJoin(both.agg(count(lit(1)).as("n_both")))
    // ExactRound (r12): the union estimate (k−1)·2⁶⁰/h_(k) and the
    // intersection scale n_both·est_union/n_union are exact integer
    // rationals — both round half-up on the 1e-4 grid in integer space
    // (the n_union ≤ k denominators make IEEE-quotient ties REACHABLE
    // here, unlike most float scores). eu4 = est_union·10⁴ as BIGINT.
    u.select(col("n_union_seen"), col("n_both"),
        when(col("n_union_seen") < k, col("n_union_seen") * lit(10000L))
          .otherwise(ExactRound.gridMicroCol(
            lit((k - 1).toLong).cast("decimal(38,0)") *
              lit(1152921504606846976L),
            col("__hk"), 4)).as("__eu4"))
      .select(col("n_union_seen"),
        (col("__eu4").cast("double") / 1e4).as("est_union"),
        col("n_both"),
        // the product is widened BEFORE multiplying (r13 / ADVICE): n_both
        // and __eu4 are both BIGINT and a raw int64 product would wrap
        // silently in non-ANSI Spark where DuckDB raises — DECIMAL(38,0)
        // staging keeps both engines exact
        (ExactRound.halfUpDivCol(
          col("n_both").cast("decimal(38,0)") * col("__eu4"),
          col("n_union_seen")).cast("double") / 1e4).as("est_inter"))
  }

  /** DuckDB twin of [[kmvIntersection]] as CTE list ending in
    * `kmv_inter(n_union_seen, est_union, n_both, est_inter)`; `aRel` /
    * `bRel` are relations (subqueries allowed) exposing `$aCol` / `$bCol`. */
  def kmvIntersectionSql(aCol: String, aRel: String, bCol: String,
      bRel: String, k: Int): String = {
    val ha = PortableHash.md5LongSql(s"$aCol::VARCHAR", 0)
    val hb = PortableHash.md5LongSql(s"$bCol::VARCHAR", 0)
    s"""__ki_a AS (SELECT DISTINCT $ha AS h FROM $aRel),
       __ki_b AS (SELECT DISTINCT $hb AS h FROM $bRel),
       __ki_m AS (SELECT DISTINCT h FROM
         (SELECT h FROM __ki_a UNION ALL SELECT h FROM __ki_b)
         ORDER BY h LIMIT $k),
       __ki_u AS (SELECT count(*) AS n_union_seen, max(h) AS hk FROM __ki_m),
       __ki_n AS (SELECT count(*) AS n_both FROM __ki_m
         WHERE h IN (SELECT h FROM __ki_a) AND h IN (SELECT h FROM __ki_b)),
       __ki_e AS (SELECT n_union_seen, n_both,
           CASE WHEN n_union_seen < $k THEN n_union_seen * 10000
             ELSE ${ExactRound.gridMicroSql(
               s"CAST(${k - 1} AS HUGEINT) * 1152921504606846976",
               "hk", 4)} END AS eu4
         FROM __ki_u, __ki_n),
       kmv_inter AS (SELECT CAST(n_union_seen AS BIGINT) AS n_union_seen,
           eu4::DOUBLE / 1e4 AS est_union,
           CAST(n_both AS BIGINT) AS n_both,
           ${ExactRound.halfUpDivSql("CAST(n_both AS HUGEINT) * eu4",
             "n_union_seen")}::DOUBLE / 1e4 AS est_inter
         FROM __ki_e)"""
  }

  def correlations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a).cast("double"), col(b).cast("double")), 4)
        .as(s"${a}__$b")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"${a}__$b").as("corr"))
    }: _*)).as("p")).select("p.*")
  }

  /** DuckDB twin of one [[profile]] row for oracle construction: the same
    * stats for column `name` of `table`, with `kind` ∈ num | str | ts |
    * other controlling which slots are non-null. */
  def profileRowSql(table: String, name: String, kind: String): String = {
    val (minS, maxS, meanS) = kind match {
      case "num" => (s"CAST(min($name) AS DOUBLE)", s"CAST(max($name) AS DOUBLE)",
        s"round(avg(CAST($name AS DOUBLE)), 4)")
      case "ts" => (s"CAST(min(epoch($name)) AS DOUBLE)",
        s"CAST(max(epoch($name)) AS DOUBLE)",
        s"round(avg(CAST(epoch($name) AS DOUBLE)), 4)")
      case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
    }
    val (minL, maxL) =
      if (kind == "str") (s"CAST(min(length($name)) AS INT)", s"CAST(max(length($name)) AS INT)")
      else ("CAST(NULL AS INT)", "CAST(NULL AS INT)")
    s"""SELECT '$name' AS "column", count(*) AS n_rows,
       | count(*) FILTER ($name IS NULL) AS n_null,
       | count(DISTINCT $name) AS n_distinct,
       | $minS AS min_num, $maxS AS max_num, $meanS AS mean_num,
       | $minL AS min_len, $maxL AS max_len
       |FROM $table""".stripMargin
  }
}
