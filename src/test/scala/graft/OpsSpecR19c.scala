package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Privacy, Sampling}

/** Round-19 addendum specs: the DP release mechanism (q306) and the
  * leakage-safe cluster split (q307). */
class OpsSpecR19c extends AnyFunSuite {
  import SparkTestSession._

  // units u0..u9, unit ui belongs to groups g0..g{i} (unit u9 in 10
  // groups — exercises the L bound); every (unit, group) row duplicated
  // to exercise the per-group distinct
  private def memberships = {
    import spark.implicits._
    val rows = for {
      i <- 0 until 10
      g <- 0 to i
      _ <- 0 until 2
    } yield (s"u$i", s"g$g")
    rows.toDF("u", "g")
  }

  test("dpGroupCounts: a huge epsilon yields an empty noise table and " +
    "EXACT bounded counts; tau then suppresses exactly") {
    val out = Privacy.dpGroupCounts(memberships, col("u"), col("g"),
      epsilonMilli = 100000000L, maxGroupsPerUnit = 1024, tau = 0L)
      .orderBy("group").collect()
    // L >= groups-per-unit -> bounding is a no-op; distinct collapses the
    // duplicated rows, so group g_k holds units u_k..u_9 = 10-k members
    assert(out.map(r => r.getString(0) -> r.getAs[Long]("noisy_count"))
      .toSeq === (0 until 10).map(k => s"g$k" -> (10L - k)))
    val sup = Privacy.dpGroupCounts(memberships, col("u"), col("g"),
      epsilonMilli = 100000000L, maxGroupsPerUnit = 1024, tau = 4L)
      .orderBy("group").collect()
    assert(sup.map(_.getString(0)).toSeq ===
      (0 to 6).map(k => s"g$k"), "groups with count < 4 must vanish")
  }

  test("dpGroupCounts: contribution bounding keeps exactly " +
    "maxGroupsPerUnit groups per unit (hash priority, not first-seen)") {
    val out = Privacy.dpGroupCounts(memberships, col("u"), col("g"),
      epsilonMilli = 100000000L, maxGroupsPerUnit = 3, tau = 0L)
      .agg(sum("noisy_count")).collect()(0).getLong(0)
    // unit ui contributes min(i+1, 3) groups; zero noise at this epsilon
    assert(out === (0 until 10).map(i => math.min(i + 1, 3)).sum)
  }

  test("dpGroupCounts: deterministic under a seed, different under " +
    "another, and the noise is genuinely nonzero at a tight budget") {
    def run(seed: Int) = Privacy.dpGroupCounts(memberships, col("u"),
      col("g"), epsilonMilli = 600L, maxGroupsPerUnit = 2, tau = 0L,
      seed = seed).orderBy("group").collect()
        .map(r => (r.getString(0), r.getAs[Long]("noisy_count"))).toSeq
    val a = run(1)
    assert(a === run(1), "same seed must replay bit-for-bit")
    assert(a !== run(2), "a fresh seed must draw fresh noise")
    val exact = Privacy.dpGroupCounts(memberships, col("u"), col("g"),
      epsilonMilli = 100000000L, maxGroupsPerUnit = 2, tau = 0L, seed = 1)
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getAs[Long]("noisy_count"))).toSeq
    assert(a !== exact, "epsilon 0.6 noise must perturb some count")
  }

  test("dpGroupCounts: the noise-table valve raises on a budget too " +
    "small for the 60-bit grid") {
    val e = intercept[IllegalArgumentException] {
      Privacy.dpGroupCounts(memberships, col("u"), col("g"),
        epsilonMilli = 1L, maxGroupsPerUnit = 1024)
    }
    assert(e.getMessage.contains("maxNoiseTable"))
  }

  test("suppressionDeltaMicro: exact value at tau=3 (alpha^2/(1+alpha) " +
    "on the micro grid), monotone decreasing in tau, capped at tau<=1") {
    val a = Privacy.alphaMicro(1000L, 1) // e^-1 -> 367879
    assert(a === 367879L)
    val S = BigInt(1000000)
    val expect = // half-up of a^2/(S+a), independently derived
      ((BigInt(a) * BigInt(a) * 2 + (S + BigInt(a))) /
        ((S + BigInt(a)) * 2)).toLong
    assert(Privacy.suppressionDeltaMicro(1000L, 1, 3L) === expect)
    val ds = (1L to 12L).map(Privacy.suppressionDeltaMicro(1000L, 1, _))
    assert(ds === ds.sorted.reverse, "delta must fall as tau rises")
    assert(Privacy.suppressionDeltaMicro(1000L, 1, 1L) === 1000000L)
  }

  test("dpGroupSums: huge epsilon -> exact quantize-clip-sum ladder " +
    "(negative totals clamp at 0, oversized totals clamp at clipUnits)") {
    import spark.implicits._
    val rows = Seq(
      ("u0", "A", 2.6), ("u0", "A", 2.6), ("u0", "A", 2.6), // 15 -> clip 10
      ("u0", "B", -4.0),                                    // -8 -> 0
      ("u1", "A", 0.3),                                     // 1
      ("u2", "B", 100.0)                                    // 200 -> clip 10
    ).toDF("u", "g", "v")
    val out = Privacy.dpGroupSums(rows, col("u"), col("g"), col("v"),
      unitScale = 2L, clipUnits = 10L, epsilonMilli = 100000000L,
      maxGroupsPerUnit = 4).orderBy("group").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("noisy_sum_units")).toSeq
    assert(out === Seq("A" -> 11L, "B" -> 10L))
  }

  test("dpGroupSums: L = 1 caps a unit's total release at one clipped " +
    "group, whichever the hash priority keeps") {
    import spark.implicits._
    val rows = Seq(("u0", "A", 50.0), ("u0", "B", 50.0), ("u0", "C", 50.0))
      .toDF("u", "g", "v")
    val out = Privacy.dpGroupSums(rows, col("u"), col("g"), col("v"),
      unitScale = 1L, clipUnits = 10L, epsilonMilli = 100000000L,
      maxGroupsPerUnit = 1)
      .agg(sum("noisy_sum_units")).collect()(0).getLong(0)
    assert(out === 10L)
  }

  test("dpGroupSums: the literal and broadcast-join draw regimes " +
    "produce identical integers (the regime switch is litMaxTable only)") {
    def run(litMax: Int) = Privacy.dpGroupSums(memberships
        .withColumn("v", length(col("g")).cast("double")),
      col("u"), col("g"), col("v"), unitScale = 2L, clipUnits = 40L,
      epsilonMilli = 1000L, maxGroupsPerUnit = 2, litMaxTable = litMax)
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getAs[Long]("noisy_sum_units"))).toSeq
    val lit = run(10000)   // 3327-entry table stays a plan literal
    val bc = run(0)        // same table through the broadcast join
    assert(lit === bc)
    val exact = Privacy.dpGroupSums(memberships
        .withColumn("v", length(col("g")).cast("double")),
      col("u"), col("g"), col("v"), unitScale = 2L, clipUnits = 40L,
      epsilonMilli = 100000000L, maxGroupsPerUnit = 2)
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getAs[Long]("noisy_sum_units"))).toSeq
    assert(lit !== exact, "the tight budget must actually perturb")
  }

  test("passAtK: hand-pinned estimator values — n<k NULL, n-c<k exact 1, " +
    "c=0 exact 0, pass@1 = c/n, and the deep fold matches its own " +
    "recurrence run in plain Scala") {
    import spark.implicits._
    import graft.ops.Evaluation
    val rows =
      (0 until 10).map(i => ("t1", i.toLong)) ++   // n=10, c=3
      (0 until 5).map(i => ("t2", i.toLong)) ++    // n=5 (NULL at k=10), c=5
      (0 until 100).map(i => ("t3", i.toLong + 100)) // n=100, c varies
    val df = rows.toDF("task", "id")
    val out = Evaluation.passAtK(df, col("task"),
      col("id") < lit(3L) || (col("task") === "t2") ||
        (col("task") === "t3" && col("id") % 10 === 0),
      ks = Seq(1, 10)).orderBy("task").collect()
    val t1 = out(0); val t2 = out(1); val t3 = out(2)
    assert(t1.getAs[Long]("pass_at_1_micro") === 300000L) // c/n = 3/10
    assert(t1.getAs[Long]("pass_at_10_micro") === 1000000L) // n-c=7 < 10
    assert(t2.getAs[Long]("pass_at_1_micro") === 1000000L) // c = n
    assert(t2.isNullAt(t2.fieldIndex("pass_at_10_micro"))) // n=5 < 10
    // t3: n=100, c=10 (ids 100..199, multiples of 10); replicate the
    // documented fold independently in plain Scala
    def fold(n: Long, c: Long, k: Int): Long = {
      var r = 1000000000L
      for (i <- 0 until k) r = r * (n - c - i) / (n - i)
      1000000L - (2 * r + 1000) / 2000
    }
    assert(t3.getAs[Long]("c") === 10L)
    assert(t3.getAs[Long]("pass_at_1_micro") === 100000L)
    assert(t3.getAs[Long]("pass_at_10_micro") === fold(100, 10, 10))
    // c = 0 -> every factor ratio is 1 -> pass exactly 0
    val zero = Evaluation.passAtK(df.filter(col("task") === "t1"),
      col("task"), lit(false), ks = Seq(1, 10)).collect()(0)
    assert(zero.getAs[Long]("pass_at_1_micro") === 0L)
    assert(zero.getAs[Long]("pass_at_10_micro") === 0L)
  }

  test("passAtK: the maxSamples valve raises in-plan instead of " +
    "overflowing the nano-grid fold") {
    import spark.implicits._
    import graft.ops.Evaluation
    val df = (0 until 10).map(i => ("t", i)).toDF("task", "id")
    val e = intercept[Exception] {
      Evaluation.passAtK(df, col("task"), col("id") < 3,
        ks = Seq(1), maxSamples = 5L).collect()
    }
    assert(e.getMessage.contains("maxSamples"))
  }

  test("dpHistogram: every PUBLIC spine bucket emits a row (empty ones " +
    "included), out-of-range values clamp to the edge buckets, and a " +
    "huge epsilon reproduces exact counts") {
    import spark.implicits._
    val rows = Seq(("u0", -5L), ("u1", 2L), ("u2", 2L), ("u3", 99L))
      .toDF("u", "v")
    val out = Privacy.dpHistogram(rows, col("u"), col("v"), lo = 0L,
      hi = 4L, epsilonMilli = 100000000L, maxGroupsPerUnit = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("noisy_count")))
    // -5 clamps into bucket 0, 99 into bucket 4; buckets 1 and 3 exist
    // WITH zero counts — the public-domain contract
    assert(out.toSeq ===
      Seq(0L -> 1L, 1L -> 0L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
    val e = intercept[IllegalArgumentException] {
      Privacy.dpHistogram(rows, col("u"), col("v"), lo = 0L,
        hi = 10000000L)
    }
    assert(e.getMessage.contains("maxBuckets"))
  }

  test("bradleyTerry: the two-model closed form is an exact fixed point " +
    "(3:1 wins -> 750000/250000 on the first iterate and every one after)") {
    import spark.implicits._
    import graft.ops.Preference
    val games = (Seq.fill(24)(("A", "B", "A")) ++
      Seq.fill(8)(("A", "B", "B"))).toDF("a", "b", "w")
    val out = Preference.bradleyTerry(games, col("a"), col("b"), col("w"),
      iters = 20).orderBy("model").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("wins"),
      r.getAs[Long]("games"), r.getAs[Long]("strength_micro"))).toSeq ===
      Seq(("A", 24L, 32L, 750000L), ("B", 8L, 32L, 250000L)))
  }

  test("bradleyTerry: a planted strength ladder is recovered monotone, " +
    "and strengths sum to exactly 1e6") {
    import spark.implicits._
    import graft.ops.Preference
    // round-robin: model i beats model j exactly 4*(i+1) times and loses
    // 4*(j+1) times -> BT MLE strengths proportional to i+1
    val rows = for {
      i <- 0 until 4; j <- 0 until 4 if i != j
      r <- 0 until 4 * (i + 1)
    } yield (s"m$i", s"m$j", s"m$i")
    val out = Preference.bradleyTerry(rows.toDF("a", "b", "w"),
      col("a"), col("b"), col("w"), iters = 50).orderBy("model").collect()
    val st = out.map(_.getAs[Long]("strength_micro"))
    assert(st.sum === 1000000L)
    assert(st.toSeq === st.sorted.toSeq,
      "strengths must rise with the planted ladder")
    assert(st.last > 2 * st.head,
      "the ladder's spread must be material, not a re-grid artifact")
  }

  test("bradleyTerry: the maxModels valve and the self-game guard raise") {
    import spark.implicits._
    import graft.ops.Preference
    val games = Seq(("A", "B", "A"), ("B", "C", "B"), ("A", "C", "C"))
      .toDF("a", "b", "w")
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(games, col("a"), col("b"), col("w"),
        maxModels = 2)
    }
    assert(e.getMessage.contains("maxModels"))
    val selfG = Seq(("A", "A", "A")).toDF("a", "b", "w")
    val e2 = intercept[Exception] {
      Preference.bradleyTerry(selfG, col("a"), col("b"), col("w"))
    }
    assert(e2.getMessage.contains("self-game"))
  }

  test("splitByCluster: every member of a cluster lands in ONE split, " +
    "singletons split on their own id, empty clusters = splitColumn") {
    import spark.implicits._
    val docs = (0L until 400L).toDF("id")
    // clusters of 4: rep 4k over nodes 4k..4k+3, for k < 50 (docs >= 200
    // stay singletons)
    val cc = (0L until 200L).map(n => (n, n / 4 * 4)).toDF("node", "cluster")
    val out = Sampling.splitByCluster(docs, col("id"), cc, seed = 7)
    val straddle = out.join(cc, col("id") === col("node"), "left")
      .groupBy(coalesce(col("cluster"), col("id")))
      .agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddle === 0L, "no cluster may span two splits")
    val bySingle = out.filter(col("id") >= 200)
      .withColumn("own", Sampling.splitColumn(col("id"),
        Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1), 7))
    assert(bySingle.filter(col("split") =!= col("own")).count() === 0L)
    // all three splits non-empty at these sizes and the member count is
    // conserved
    assert(out.count() === 400L)
    assert(out.select("split").distinct().count() === 3L)
    val empty = spark.emptyDataFrame
      .withColumn("node", lit(0L)).withColumn("cluster", lit(0L))
    val plain = Sampling.splitByCluster(docs, col("id"), empty, seed = 7)
      .withColumn("own", Sampling.splitColumn(col("id"),
        Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1), 7))
    assert(plain.filter(col("split") =!= col("own")).count() === 0L)
  }
}
