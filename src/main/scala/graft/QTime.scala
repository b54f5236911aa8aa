package graft

/** Dev-only timing harness: `runMain graft.QTime q74_dup_clusters [q45...]`
  * times the named queries (warmup + 2 timed passes, min) against
  * SPARK_GRAFT_SF_DIR. Not part of the driver contract — Bench is. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-qtime")
    def purge(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    args.foreach { name =>
      purge(); SparkEntry.queries(name)(spark, sfDir).count()
      val times = (1 to 2).map { _ =>
        purge()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $name%-24s ${times.min}%8.3f s  (runs: ${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
