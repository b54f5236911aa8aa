package graft

import org.apache.spark.sql.functions._

/** Dev probe behind the r18 dupClusters-scaling investigation (r17
  * verdict Next #6: q74 8.04× / q297 7.35× cpu at 10× — the worst
  * family in SCALING_r17; is the candidate pair table or the CC loop
  * the growth, and would a prune move it?): decomposes q74's cost into
  *
  *  1. PAIR BUILD — `Dedup.jaccardPairs` (shingle profile → AllPairs +
  *     PPJoin prefix join → exact verify), timed to a materialized
  *     pair table, with the pair/doc counts that tell us whether edge
  *     volume grows linearly with the corpus;
  *  2. CC LOOP — `Dedup.dupClusters` over the PRE-MATERIALIZED pairs
  *     (localCheckpoint, so none of the pair-build lineage re-runs),
  *     i.e. the label-propagation rounds alone.
  *
  * `runMain graft.DupProbe <sfDir>` prints one JSON line. Same
  * process-cpu methodology as [[ScaleCpu]]. */
object DupProbe {

  private def cpuSeconds(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime / 1e9
      case _ => 0.0
    }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: DupProbe <sfDir>")
    val sfDir = args(0)
    val spark = GraftSession.create("graft-dup-probe",
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    def timed[T](f: => T): (T, Double, Double) = {
      val c0 = cpuSeconds(); val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9, cpuSeconds() - c0)
    }
    // warmup (JIT + codegen caches), then the timed pass — the ScaleCpu
    // discipline
    graft.ops.Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, minJaccard = 0.9).write.format("noop").mode("overwrite").save()
    val (pairs, wBuild, cBuild) = timed {
      graft.ops.Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, minJaccard = 0.9).localCheckpoint(true)
    }
    val nPairs = pairs.count()
    val (_, wCc, cCc) = timed {
      graft.ops.Dedup.dupClusters(pairs)
        .write.format("noop").mode("overwrite").save()
    }
    val nClustersOver1 = graft.ops.Dedup.dupClusters(pairs)
      .groupBy("cluster").count().filter(col("count") > 1).count()
    def r3(v: Double): Double = (v * 1000).round / 1000.0
    println(s"""{"sf":"$sfDir","n_docs":$nDocs,"n_pairs":$nPairs,""" +
      s""""n_multi_clusters":$nClustersOver1,""" +
      s""""pair_build":{"wall":${r3(wBuild)},"cpu":${r3(cBuild)}},""" +
      s""""cc_loop":{"wall":${r3(wCc)},"cpu":${r3(cCc)}}}""")
    spark.stop()
  }
}
