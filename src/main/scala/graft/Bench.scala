package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Each query is executed once untimed (JVM/codegen/scan warmup — otherwise
  * whichever query runs first absorbs ~5 s of cold-start and the numbers are
  * noise), then once timed. */
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-bench")
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name => // warmup pass
      purgeStorage(spark)
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // two timed passes, per-query MIN: a single pass is hostage to ambient
    // load spikes (this box is shared); the min of two storage-cold runs is
    // the standard way to report the query's actual cost
    def timedPass(): Seq[(String, Double)] = names.map { name =>
      purgeStorage(spark)
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // a failed run must not win the min(): its time-to-crash would make a
      // flaky query look like the fastest in the suite
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue)
    }
    val (p1, p2) = (timedPass(), timedPass())
    val results = p1.zip(p2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    purgeStorage(spark)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
