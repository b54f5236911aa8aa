package graft

/** Dev-only timing harness: `runMain graft.QTime q74_dup_clusters [q45...]`
  * times the named queries (warmup + 2 timed passes, min) against
  * SPARK_GRAFT_SF_DIR. Not part of the driver contract — Bench is.
  * Materializes the FULL result through a noop write (same as Bench) so
  * Catalyst can't prune final-projection work the way `.count()` allows. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val known = SparkEntry.queries.keySet
    val unknown = args.filterNot(known)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\n" +
        s"known: ${known.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = GraftSession.create("graft-qtime")
    def purge(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      graft.ops.TextAnalysis.clearGramCache()
    }
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      purge(); run(name)
      val times = (1 to 2).map { _ =>
        purge()
        val t0 = System.nanoTime()
        run(name)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $name%-24s ${times.min}%8.3f s  (runs: ${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
