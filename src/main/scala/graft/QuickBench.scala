package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop profiler: Bench's exact methodology (storage purge, warmup,
  * two timed passes, per-query min) over a SUBSET of queries, so a single
  * slow query can be iterated on without paying the full-suite run.
  *
  * Usage: runMain graft.QuickBench <sfDir> <query ...>
  */
object QuickBench {
  private def purgeStorage(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create("graft-quickbench")
    names.foreach { name =>
      purgeStorage(spark)
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"$name warmup FAILED: $e") }
    }
    def timedPass(): Seq[(String, Double)] = names.map { name =>
      purgeStorage(spark)
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue)
    }
    val (p1, p2) = (timedPass(), timedPass())
    p1.zip(p2).foreach { case ((n, a), (_, b)) =>
      println(f"$n%-24s min=${math.min(a, b)}%8.3f  (p1=$a%.3f p2=$b%.3f)")
    }
    spark.stop()
  }
}
