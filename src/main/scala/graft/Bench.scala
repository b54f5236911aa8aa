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
  * fabricated a contiguous q59–q68 "regression" block that never existed):
  *  - ≥2 timed passes, each in a DIFFERENT deterministic shuffled order, so
  *    a 30–60 s ambient load spike cannot elevate the same alphabetical
  *    block in every pass;
  *  - per-query MIN across passes (the min of storage-cold runs is the
  *    query's actual cost — noise is strictly additive);
  *  - queries whose pass-to-pass spread exceeds 2× get ONE targeted re-time
  *    pass, then anything whose min is still only supported by a single
  *    sample (second-best > 2× best) is reported in a `suspect` list with
  *    `"contaminated": true` so downstream perf triage knows the number is
  *    load-afflicted, not a code regression. */
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-bench")
    val names = SparkEntry.queries.keys.toSeq.sorted

    names.foreach { name => // warmup pass
      purgeStorage(spark)
      try materialize(SparkEntry.queries(name)(spark, sfDir))
      catch { case _: Throwable => () }
    }

    // a failed run must not win the min(): its time-to-crash would make a
    // flaky query look like the fastest in the suite
    def timeOne(name: String): Double = {
      purgeStorage(spark)
      val t0 = System.nanoTime()
      val ok =
        try { materialize(SparkEntry.queries(name)(spark, sfDir)); true }
        catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
    }

    def timedPass(order: Seq[String]): Map[String, Double] =
      order.map(n => n -> timeOne(n)).toMap

    def shuffled(seed: Long, xs: Seq[String]): Seq[String] =
      new scala.util.Random(seed).shuffle(xs)

    val passes = Seq(timedPass(shuffled(1L, names)), timedPass(shuffled(2L, names)))
    val samples0: Map[String, Seq[Double]] =
      names.map(n => n -> passes.map(_(n))).toMap

    // one targeted re-time for queries whose two samples disagree > 2×
    val retry = names.filter { n =>
      val s = samples0(n)
      s.min > MinSuspectSec && s.max / s.min > SpreadRatio
    }
    val samples: Map[String, Seq[Double]] =
      if (retry.isEmpty) samples0
      else {
        val p3 = timedPass(shuffled(3L, retry))
        samples0.map { case (n, s) => n -> (s ++ p3.get(n)) }
      }

    // suspect = min supported by a single sample even after the re-time:
    // trust the min, but mark it so a "regression" here is re-measured
    // before anyone optimizes against it
    val suspect = names.filter { n =>
      val s = samples(n).sorted
      s.head > MinSuspectSec && s(1) / s.head > SpreadRatio
    }

    val results = names.map(n => n -> samples(n).min)
    purgeStorage(spark)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val suspectJson = suspect.map("\"" + _ + "\"").mkString("[", ",", "]")
    // "timing" documents the r6 method change for cross-round comparison:
    // earlier rounds timed `.count()`, which let Catalyst prune all
    // projection work a query's output columns carried (md5s, string ops);
    // noop-write times the FULL result, so projection-heavy queries read
    // higher here than in BENCH_r5 and earlier without having regressed.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""passes":${if (retry.isEmpty) 2 else 3},"contaminated":${suspect.nonEmpty},""" +
      s""""suspect":$suspectJson,"timing":"noop-write full materialization (r5 and earlier: count())",""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
