package graft

/** Dev probe for the r16 n-gram count-table memo: runs q169 (unpruned
  * 5-gram ladder) then q175 (pruned — a filter over the SAME unpruned
  * tables) in one session twice over — (a) purged between queries (the
  * Bench/ScaleCpu/Verify per-query isolation shape: the memo's persist is
  * dropped externally and both queries rebuild the ladder storage-cold);
  * (b) shared session, no purge (the production multi-query shape: q175
  * reuses q169's persisted tables). `runMain graft.GramProbe <sfDir>`.
  * Not part of the driver contract. */
object GramProbe {
  private def cpuSeconds(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime / 1e9
      case _ => 0.0
    }

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = GraftSession.create("graft-gramprobe",
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def purge(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      graft.ops.TextAnalysis.clearGramCache()
    }
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
    // JIT/IO warm: one throwaway pass of both, purged
    purge(); run("q169_lm_quality_5gram"); purge(); run("q175_lm_5gram_pruned")
    def pair(label: String, purgeBetween: Boolean,
        memoMode: String): Unit = {
      spark.conf.set("spark.graft.gramMemo", memoMode)
      purge()
      val w0 = System.nanoTime(); val c0 = cpuSeconds()
      run("q169_lm_quality_5gram")
      if (purgeBetween) purge()
      run("q175_lm_5gram_pruned")
      val wall = (System.nanoTime() - w0) / 1e9
      val cpu = cpuSeconds() - c0
      println(f"[gramprobe] $label%-22s wall=$wall%7.2fs cpu=$cpu%7.2fs")
      spark.conf.unset("spark.graft.gramMemo")
    }
    // isolation = the Bench/ScaleCpu/Verify shape: default deferred memo,
    // storage purged between queries — must cost exactly the pre-memo
    // plans. shared = the production multi-scorer shape: the session
    // opts into spark.graft.gramMemo=eager and q175 reuses q169's
    // persisted tables.
    pair("purged (isolation)", purgeBetween = true, memoMode = "deferred")
    pair("shared (memo eager)", purgeBetween = false, memoMode = "eager")
    pair("purged (isolation)", purgeBetween = true, memoMode = "deferred")
    pair("shared (memo eager)", purgeBetween = false, memoMode = "eager")
    spark.stop()
  }
}
