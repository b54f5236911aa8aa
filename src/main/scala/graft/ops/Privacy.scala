package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Differentially-private release of corpus statistics — the natural next
  * step of the governance stack (takedown → erasure → certificate →
  * privacy-preserving RELEASE): a data-protection officer who can prove
  * deletion still needs per-group counts (docs per source, events per
  * type, prompts per template) published OUTSIDE the trust boundary, and
  * raw counts leak membership.
  *
  * Mechanism: the two-sided geometric (discrete Laplace) mechanism of
  * Ghosh–Roughgarden–Sundararajan 2009 — the integer-valued ε-DP
  * mechanism (utility-optimal for counts; the 2020 US Census TopDown
  * discipline), with the two standard deployment layers on top:
  *
  *  - '''contribution bounding''': one unit (user, author) contributes at
  *    most once per group (distinct) and to at most `maxGroupsPerUnit`
  *    groups — the surviving groups picked by deterministic hash priority
  *    (the [[Sampling.budgetPerGroup]] prefix discipline), never "first
  *    seen" (order-dependent). Add/remove of one unit then moves at most
  *    L counts by 1 each, so per-count noise at scale ε/L yields ε
  *    user-level DP by composition.
  *  - '''τ-thresholding''' (partition selection): groups are released
  *    only while the NOISY count clears `tau` — releasing the group SET
  *    from the data itself is what leaks presence; thresholding bounds
  *    that leak by δ ≤ L·α^(τ−1)/(1+α) (one unit's new group holds true
  *    count 1 and survives only if 1+Z ≥ τ), the (ε,δ) accounting of the
  *    big DP SQL engines. [[suppressionDeltaMicro]] computes the bound.
  *
  * Exactness discipline: the ONE float op is `a = round(1e6·exp(−ε/L))`
  * (the per-step geometric ratio quantized to the micro grid — the
  * doremiWeights rule); everything after is exact integers. Noise is
  * drawn by inverse CDF over the 60-bit [[PortableHash.md5Long]] uniform:
  * the threshold table `m_k` is DEFINED by the integer floor recurrence
  * `m_0 = ⌊2^60·a/1e6⌋, m_{k+1} = ⌊m_k·a/1e6⌋`, and
  * `G = #{k : u < m_k}` is geometric(1−α) under that realized CDF, so
  * `Z = G₁ − G₂` is the two-sided geometric — both engines replay the
  * recurrence and the count bit-for-bit (the ε of the REALIZED pmf
  * differs from ideal only by the per-step floor, < 2⁻⁶⁰ per entry — the
  * standard snap-to-grid caveat of production DP libraries, which also
  * sample on a fixed-point grid).
  *
  * Determinism vs privacy: `seed` makes the draw a pure function of
  * (group, seed) — the reproducibility/testing hook (the splitColumn
  * contract, and what lets the DuckDB oracle replay the mechanism).
  * Production callers MUST pass a fresh secret seed per release and
  * never reuse it: the DP guarantee is over the seed draw (md5 as PRF),
  * and republishing under a reused seed spends no new budget but adds no
  * new protection either.
  *
  * Scale shape: one distinct (shuffle on unit+group), one per-unit
  * window (key cardinality = #units — full parallelism), one group
  * aggregation; the noise table is a driver-built array literal
  * (≤ `maxNoiseTable` entries, valved) evaluated per GROUP row — groups
  * are aggregate-sized, and the filter/size combinator stays inside
  * whole-stage codegen. No corpus-sized join anywhere.
  */
object Privacy {

  /** 60-bit uniform space of [[PortableHash.md5Long]]. */
  private val M: BigInt = BigInt(1) << 60
  private val S = 1000000L

  /** Micro-grid geometric ratio `a = round(1e6·exp(−ε/L))` — the one
    * float op, shared by op, SQL twin and the δ helper. */
  def alphaMicro(epsilonMilli: Long, maxGroupsPerUnit: Int): Long =
    Math.round(1e6 * Math.exp(
      -epsilonMilli.toDouble / (1000.0 * maxGroupsPerUnit)))

  /** Threshold table of the realized geometric CDF:
    * `m_k = ⌊…⌊2^60·a/1e6⌋·a/1e6…⌋` (k+1 floors), down to 0. */
  private def noiseTable(a: Long, maxLen: Int): Array[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var m = M * a / S
    while (m > 0 && buf.length <= maxLen) {
      buf += m.toLong
      m = m * a / S
    }
    require(buf.length <= maxLen,
      s"dpGroupCounts: noise table exceeds maxNoiseTable=$maxLen — " +
        "epsilonMilli/maxGroupsPerUnit is too small for the 60-bit " +
        "uniform grid; raise maxNoiseTable deliberately (the table is a " +
        "plan literal) or relax the budget")
    buf.toArray
  }

  /** ε-DP noisy per-group unit counts, τ-thresholded.
    *
    * Returns `(group, noisy_count)` — and nothing else: the true count
    * must not ride along (releasing it would void the guarantee).
    *
    * @param unit             privacy-unit column (user id, author id)
    * @param group            the partition key being counted
    * @param epsilonMilli     ε in milli-units (1000 = ε 1.0) — the TOTAL
    *                         user-level budget; per-count noise runs at
    *                         ε/maxGroupsPerUnit
    * @param maxGroupsPerUnit contribution bound L (hash-priority keep)
    * @param tau              suppress rows whose noisy count < tau
    *                         (0 = no suppression — only valid when the
    *                         group SET is public knowledge)
    */
  def dpGroupCounts(df: DataFrame, unit: Column, group: Column,
      epsilonMilli: Long = 1000L, maxGroupsPerUnit: Int = 4,
      tau: Long = 0L, seed: Int = 42,
      maxNoiseTable: Int = 8192): DataFrame = {
    require(epsilonMilli >= 1, s"epsilonMilli must be >= 1, got $epsilonMilli")
    require(maxGroupsPerUnit >= 1 && maxGroupsPerUnit <= 1024,
      s"maxGroupsPerUnit must be 1..1024, got $maxGroupsPerUnit")
    require(tau >= 0, s"tau must be >= 0, got $tau")
    val a = alphaMicro(epsilonMilli, maxGroupsPerUnit)
    val table = noiseTable(a, maxNoiseTable)
    val pairs = df.select(unit.as("__u"), group.as("group")).distinct()
    val pr = PortableHash.md5Long(
      concat(col("__u").cast("string"), lit("|"),
        col("group").cast("string")), seed)
    val bounded = pairs
      .withColumn("__rk", row_number().over(Window.partitionBy("__u")
        .orderBy(pr, col("group").cast("string"))))
      .filter(col("__rk") <= maxGroupsPerUnit)
    val counts = bounded.groupBy("group").agg(count(lit(1)).as("__n"))
    def u(salt: String): Column = PortableHash.md5Long(
      concat(col("group").cast("string"), lit(salt)), seed)
    val noisy =
      if (table.isEmpty) counts.withColumn("noisy_count", col("__n"))
      else {
        // G(u) = #{k : u < m_k}: the table is a plan-literal array, the
        // count a fused filter+size — per-row bounded work, no join
        val ms = lit(table)
        def g(uc: Column): Column =
          size(filter(ms, m => m > uc)).cast("long")
        counts.withColumn("noisy_count",
          col("__n") + g(u("|n1")) - g(u("|n2")))
      }
    val kept =
      if (tau > 0) noisy.filter(col("noisy_count") >= tau) else noisy
    kept.select(col("group"), col("noisy_count"))
  }

  /** DuckDB twin of [[dpGroupCounts]] over table `tbl` with unit column
    * `unitCol` and group column `groupCol` — replays the hash-priority
    * bounding, the floor-recurrence threshold table and both geometric
    * draws exactly (exp re-evaluated IN the oracle engine; micro-grid
    * rounding absorbs cross-engine libm ULP, the doremi rule). */
  def dpGroupCountsSql(tbl: String, unitCol: String, groupCol: String,
      epsilonMilli: Long = 1000L, maxGroupsPerUnit: Int = 4,
      tau: Long = 0L, seed: Int = 42): String = {
    val prSql = PortableHash.md5LongSql(
      "un::VARCHAR || '|' || grp::VARCHAR", seed)
    def uSql(salt: String): String =
      PortableHash.md5LongSql(s"""grp::VARCHAR || '$salt'""", seed)
    val eps = s"$epsilonMilli.0 / (1000.0 * $maxGroupsPerUnit)"
    s"""WITH RECURSIVE a AS (
       |   SELECT CAST(round(1e6 * exp(-($eps))) AS HUGEINT) AS a),
       | nt(m) AS (
       |   SELECT (1152921504606846976::HUGEINT * a) // 1000000 FROM a
       |   UNION ALL SELECT (m * a) // 1000000 FROM nt, a WHERE m > 0),
       | ms AS (SELECT coalesce(list(m) FILTER (WHERE m > 0), []) AS ms
       |   FROM nt),
       | pairs AS (SELECT DISTINCT $unitCol AS un, $groupCol AS grp
       |   FROM $tbl),
       | bnd AS (SELECT un, grp, row_number() OVER (PARTITION BY un
       |     ORDER BY $prSql, grp::VARCHAR) AS rk
       |   FROM pairs),
       | cnt AS (SELECT grp, count(*) AS n FROM bnd
       |   WHERE rk <= $maxGroupsPerUnit GROUP BY 1),
       | nz AS (SELECT grp, n
       |     + len(list_filter(ms, m -> m > ${uSql("|n1")}))
       |     - len(list_filter(ms, m -> m > ${uSql("|n2")})) AS noisy_count
       |   FROM cnt CROSS JOIN ms)
       | SELECT grp AS "group", CAST(noisy_count AS BIGINT) AS noisy_count
       | FROM nz WHERE noisy_count >= $tau""".stripMargin
  }

  /** ε-DP noisy per-group SUMS — the other half of a telemetry release
    * (counts say how many, sums/means say how much). The mechanism is
    * the same two-sided geometric, with the sum-specific layer on top:
    * each unit's per-group total is quantized to the integer grid
    * (`valueUnits = round(value·unitScale)` — multiplication, never
    * division, the cross-engine round discipline) and CLAMPED to
    * `[0, clipUnits]` — add/remove of one unit then moves ≤ L group sums
    * by ≤ clipUnits units each, so per-sum noise runs the geometric at
    * `α = exp(−ε/(L·clipUnits))` (discrete Laplace of sensitivity
    * clipUnits·L across the release). Clipping bias is the caller's
    * knob, as in every production DP-SQL engine: clipUnits too low
    * biases the sum down, too high wastes budget — both engines replay
    * whatever is chosen.
    *
    * Output `(group, noisy_sum_units)` on the unit grid (caller divides
    * by unitScale outside the trust boundary if display units are
    * wanted). The noise table here is typically LONGER than the counts
    * table (length ≈ 41.6·L·clipUnits/ε) — past `litMaxTable` entries
    * the threshold count switches from the plan-literal filter+size to a
    * broadcast-join conditional sum (same integers, spec-pinned equal;
    * the antiJoinWithBloom regime-switch discipline). */
  def dpGroupSums(df: DataFrame, unit: Column, group: Column,
      value: Column, unitScale: Long = 1L, clipUnits: Long = 100L,
      epsilonMilli: Long = 1000L, maxGroupsPerUnit: Int = 2,
      tau: Long = 0L, seed: Int = 42, maxNoiseTable: Int = 32768,
      litMaxTable: Int = 2048): DataFrame = {
    require(epsilonMilli >= 1, s"epsilonMilli must be >= 1, got $epsilonMilli")
    require(maxGroupsPerUnit >= 1 && maxGroupsPerUnit <= 1024,
      s"maxGroupsPerUnit must be 1..1024, got $maxGroupsPerUnit")
    require(unitScale >= 1, s"unitScale must be >= 1, got $unitScale")
    require(clipUnits >= 1, s"clipUnits must be >= 1, got $clipUnits")
    val a = Math.round(1e6 * Math.exp(-epsilonMilli.toDouble /
      (1000.0 * maxGroupsPerUnit * clipUnits)))
    val table = noiseTable(a, maxNoiseTable)
    val perUG = df
      .select(unit.as("__u"), group.as("group"),
        round(value * unitScale).cast("long").as("__v"))
      .groupBy("__u", "group")
      .agg(least(greatest(coalesce(sum("__v"), lit(0L)), lit(0L)),
        lit(clipUnits)).as("__c"))
    val pr = PortableHash.md5Long(
      concat(col("__u").cast("string"), lit("|"),
        col("group").cast("string")), seed)
    val bounded = perUG
      .withColumn("__rk", row_number().over(Window.partitionBy("__u")
        .orderBy(pr, col("group").cast("string"))))
      .filter(col("__rk") <= maxGroupsPerUnit)
    val sums = bounded.groupBy("group").agg(sum("__c").as("__n"))
    def u(salt: String): Column = PortableHash.md5Long(
      concat(col("group").cast("string"), lit(salt)), seed)
    val noisy =
      if (table.isEmpty) sums.withColumn("noisy_sum_units", col("__n"))
      else if (table.length <= litMaxTable) {
        val ms = lit(table)
        def g(uc: Column): Column =
          size(filter(ms, m => m > uc)).cast("long")
        sums.withColumn("noisy_sum_units",
          col("__n") + g(u("|n1")) - g(u("|n2")))
      } else {
        val spark = df.sparkSession
        import spark.implicits._
        val ms = table.toSeq.toDF("__m")
        sums
          .withColumn("__u1", u("|n1")).withColumn("__u2", u("|n2"))
          .crossJoin(broadcast(ms))
          .groupBy("group", "__n", "__u1", "__u2")
          .agg(sum(when(col("__m") > col("__u1"), 1L).otherwise(0L))
              .as("__g1"),
            sum(when(col("__m") > col("__u2"), 1L).otherwise(0L))
              .as("__g2"))
          .withColumn("noisy_sum_units",
            col("__n") + col("__g1") - col("__g2"))
      }
    val kept =
      if (tau > 0) noisy.filter(col("noisy_sum_units") >= tau) else noisy
    kept.select(col("group"), col("noisy_sum_units"))
  }

  /** DuckDB twin of [[dpGroupSums]] (`valueExpr` is the raw value SQL
    * expression over `tbl`'s columns). The list-filter draw is
    * regime-free — one SQL shape replays both the literal and the
    * broadcast-join Spark paths. */
  def dpGroupSumsSql(tbl: String, unitCol: String, groupCol: String,
      valueExpr: String, unitScale: Long = 1L, clipUnits: Long = 100L,
      epsilonMilli: Long = 1000L, maxGroupsPerUnit: Int = 2,
      tau: Long = 0L, seed: Int = 42): String = {
    val prSql = PortableHash.md5LongSql(
      "un::VARCHAR || '|' || grp::VARCHAR", seed)
    def uSql(salt: String): String =
      PortableHash.md5LongSql(s"""grp::VARCHAR || '$salt'""", seed)
    val eps =
      s"$epsilonMilli.0 / (1000.0 * $maxGroupsPerUnit * $clipUnits)"
    s"""WITH RECURSIVE a AS (
       |   SELECT CAST(round(1e6 * exp(-($eps))) AS HUGEINT) AS a),
       | nt(m) AS (
       |   SELECT (1152921504606846976::HUGEINT * a) // 1000000 FROM a
       |   UNION ALL SELECT (m * a) // 1000000 FROM nt, a WHERE m > 0),
       | ms AS (SELECT coalesce(list(m) FILTER (WHERE m > 0), []) AS ms
       |   FROM nt),
       | pug AS (SELECT $unitCol AS un, $groupCol AS grp,
       |     least(greatest(coalesce(sum(CAST(round(($valueExpr)
       |       * $unitScale) AS BIGINT)), 0), 0), $clipUnits) AS c
       |   FROM $tbl GROUP BY 1, 2),
       | bnd AS (SELECT un, grp, c, row_number() OVER (PARTITION BY un
       |     ORDER BY $prSql, grp::VARCHAR) AS rk
       |   FROM pug),
       | cnt AS (SELECT grp, sum(c) AS n FROM bnd
       |   WHERE rk <= $maxGroupsPerUnit GROUP BY 1),
       | nz AS (SELECT grp, n
       |     + len(list_filter(ms, m -> m > ${uSql("|n1")}))
       |     - len(list_filter(ms, m -> m > ${uSql("|n2")})) AS noisy
       |   FROM cnt CROSS JOIN ms)
       | SELECT grp AS "group", CAST(noisy AS BIGINT) AS noisy_sum_units
       | FROM nz WHERE noisy >= $tau""".stripMargin
  }

  /** ε-DP histogram over a PUBLIC integer bucket domain — the release
    * shape [[dpGroupCounts]] cannot provide: when the group set is known
    * in advance (value buckets, ages, dates), a correct DP histogram
    * must emit a noisy count for EVERY bucket of the public domain,
    * including empty ones — releasing only non-empty buckets leaks
    * which buckets were occupied (that's exactly the presence signal
    * dpGroupCounts pays τ-thresholding + δ to suppress; with a public
    * domain the spine is free and no δ is spent). Downstream quantile /
    * CDF extraction is then pure post-processing (DP's closure under
    * post-processing — no extra budget), e.g. the first bucket whose
    * clamped cumulative sum crosses q·total.
    *
    * `bucket` must already be integer-valued (the caller quantizes —
    * multiply-then-round, the dpGroupSums discipline); rows outside
    * `[lo, hi]` CLAMP to the edge buckets (standard practice: the edge
    * buckets absorb outliers, keeping sensitivity 1 — dropping them
    * would silently underreport). One unit counts once per bucket and
    * in at most `maxGroupsPerUnit` buckets, as in dpGroupCounts.
    *
    * Scale shape: the spine is `spark.range(lo, hi+1)` (valved at
    * `maxBuckets`) left-joined to the aggregated counts — spine-sized
    * work, never corpus-sized; the noise draw is the same plan-literal
    * filter+size as dpGroupCounts. Returns one row per bucket in
    * [lo, hi]: `(bucket, noisy_count)`. */
  def dpHistogram(df: DataFrame, unit: Column, bucket: Column,
      lo: Long, hi: Long, epsilonMilli: Long = 1000L,
      maxGroupsPerUnit: Int = 4, seed: Int = 42,
      maxBuckets: Long = 100000L, maxNoiseTable: Int = 8192): DataFrame = {
    require(epsilonMilli >= 1, s"epsilonMilli must be >= 1, got $epsilonMilli")
    require(maxGroupsPerUnit >= 1 && maxGroupsPerUnit <= 1024,
      s"maxGroupsPerUnit must be 1..1024, got $maxGroupsPerUnit")
    require(lo <= hi, s"need lo <= hi, got $lo > $hi")
    require(lo > Long.MinValue / 2 && hi < Long.MaxValue / 2,
      s"spine bounds must sit inside +/-2^62 (overflow headroom), " +
        s"got [$lo, $hi]")
    require(hi - lo + 1 <= maxBuckets,
      s"dpHistogram: ${hi - lo + 1} buckets exceeds maxBuckets=" +
        s"$maxBuckets — a released histogram is a driver-consumable " +
        "artifact; coarsen the bucket grid or raise the valve")
    val a = alphaMicro(epsilonMilli, maxGroupsPerUnit)
    val table = noiseTable(a, maxNoiseTable)
    val pairs = df.select(unit.as("__u"),
        least(greatest(bucket.cast("long"), lit(lo)), lit(hi))
          .as("bucket"))
      .distinct()
    val pr = PortableHash.md5Long(
      concat(col("__u").cast("string"), lit("|"),
        col("bucket").cast("string")), seed)
    val bounded = pairs
      .withColumn("__rk", row_number().over(Window.partitionBy("__u")
        .orderBy(pr, col("bucket"))))
      .filter(col("__rk") <= maxGroupsPerUnit)
    val counts = bounded.groupBy("bucket").agg(count(lit(1)).as("__n"))
    val spark = df.sparkSession
    val spine = spark.range(lo, hi + 1).toDF("bucket")
    val full = spine.join(counts, Seq("bucket"), "left")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
    def u(salt: String): Column = PortableHash.md5Long(
      concat(col("bucket").cast("string"), lit(salt)), seed)
    val noisy =
      if (table.isEmpty) full.withColumn("noisy_count", col("__n"))
      else {
        val ms = lit(table)
        def g(uc: Column): Column =
          size(filter(ms, m => m > uc)).cast("long")
        full.withColumn("noisy_count",
          col("__n") + g(u("|n1")) - g(u("|n2")))
      }
    noisy.select(col("bucket"), col("noisy_count"))
  }

  /** DuckDB twin of [[dpHistogram]] (`bucketExpr` integer-valued SQL
    * over `tbl`'s columns; clamping to [lo, hi] applied here too). */
  def dpHistogramSql(tbl: String, unitCol: String, bucketExpr: String,
      lo: Long, hi: Long, epsilonMilli: Long = 1000L,
      maxGroupsPerUnit: Int = 4, seed: Int = 42): String = {
    val prSql = PortableHash.md5LongSql(
      "un::VARCHAR || '|' || bucket::VARCHAR", seed)
    def uSql(salt: String): String =
      PortableHash.md5LongSql(s"""bucket::VARCHAR || '$salt'""", seed)
    val eps = s"$epsilonMilli.0 / (1000.0 * $maxGroupsPerUnit)"
    s"""WITH RECURSIVE a AS (
       |   SELECT CAST(round(1e6 * exp(-($eps))) AS HUGEINT) AS a),
       | nt(m) AS (
       |   SELECT (1152921504606846976::HUGEINT * a) // 1000000 FROM a
       |   UNION ALL SELECT (m * a) // 1000000 FROM nt, a WHERE m > 0),
       | ms AS (SELECT coalesce(list(m) FILTER (WHERE m > 0), []) AS ms
       |   FROM nt),
       | pairs AS (SELECT DISTINCT $unitCol AS un,
       |     least(greatest(CAST($bucketExpr AS BIGINT), $lo), $hi)
       |       AS bucket
       |   FROM $tbl),
       | bnd AS (SELECT un, bucket, row_number() OVER (PARTITION BY un
       |     ORDER BY $prSql, bucket) AS rk
       |   FROM pairs),
       | cnt AS (SELECT bucket, count(*) AS n FROM bnd
       |   WHERE rk <= $maxGroupsPerUnit GROUP BY 1),
       | sp AS (SELECT unnest(generate_series($lo, $hi)) AS bucket),
       | fl AS (SELECT sp.bucket, coalesce(cnt.n, 0) AS n
       |   FROM sp LEFT JOIN cnt USING (bucket))
       | SELECT bucket, CAST(n
       |   + len(list_filter(ms, m -> m > ${uSql("|n1")}))
       |   - len(list_filter(ms, m -> m > ${uSql("|n2")})) AS BIGINT)
       |     AS noisy_count
       | FROM fl CROSS JOIN ms""".stripMargin
  }

  /** Upper bound, on the micro grid, of the τ-thresholding δ:
    * `δ ≤ L·α^(τ−1)/(1+α)` with `α = a/1e6` exact-rational (one unit's
    * unreleased-group survival odds across its ≤ L groups). Returns
    * δ·1e6 half-up; τ ≤ 1 returns 1e6·L capped (no suppression → the
    * group set itself is released — only sound for public group sets). */
  def suppressionDeltaMicro(epsilonMilli: Long, maxGroupsPerUnit: Int,
      tau: Long): Long = {
    val a = alphaMicro(epsilonMilli, maxGroupsPerUnit)
    val l = BigInt(maxGroupsPerUnit)
    if (tau <= 1) return (l * S).min(S).toLong
    // L·(a/S)^(τ-1) / (1 + a/S) = L·a^(τ-1)·S / (S^(τ-1)·(S+a))
    val t = (tau - 1).toInt
    val num = l * BigInt(a).pow(t) * S * S
    val den = BigInt(S).pow(t) * (S + a)
    // BigInt half-up (positive operands): ⌊(2·num + den) / (2·den)⌋
    (((num * 2 + den) / (den * 2)).min(BigInt(S))).toLong
  }
}
