package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe for the r15 semantic-walk memo: times the q268 pipeline under
  * (a) the r14 shape — broadcast edge restriction, no persist; (b) hash-join
  * edge restriction, no persist; (c) hash-join + persisted walk (shipped).
  * `runMain graft.WalkProbe <sfDir>`. Not part of the driver contract. */
object WalkProbe {
  private def cpuSeconds(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime / 1e9
      case _ => 0.0
    }

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = GraftSession.create("graft-walkprobe",
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.ops.{Assembly, Chunking, Similarity => Sim}
    def t(name: String): DataFrame = spark.read.parquet(s"$d/$name.parquet")
    def build(bcast: Boolean, persist: Boolean): DataFrame = {
      val docs = t("documents")
      val src = docs.select(col("doc_id"), col("source"))
      val g = Sim.knnGraph(t("embeddings"), col("vec_id"), col("embedding"),
        bits = 8, k = 3)
      def side(df: DataFrame) = if (bcast) broadcast(df) else df
      val edges = g
        .join(side(src.select(col("doc_id").as("i"), col("source").as("g"))), "i")
        .join(side(src.select(col("doc_id").as("j"), col("source").as("__gj"))), "j")
        .filter(col("g") === col("__gj"))
        .select(col("g"), col("i"), col("j"), col("rk"))
      val order0 = Assembly.semanticWalk(
        docs.select(col("source"), col("doc_id")), col("source"),
        col("doc_id"), edges)
      val order = if (persist)
        order0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else order0
      val chunks = Chunking.chunk(docs, col("doc_id"), col("text"),
        width = 32, stride = 32)
      val packed = Chunking.packOrdered(chunks.join(order, "doc"),
        col("g"), ctx = 128, Seq(col("pos"), col("chunk_idx")))
      packed.groupBy("g", "pos", "doc")
        .agg(count(lit(1)).as("n_chunks"),
          sum("n_tok").cast("long").as("sum_tok"),
          min("bin").cast("long").as("bin_first"),
          max("bin").cast("long").as("bin_last"))
    }
    def purge(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    Seq(("bcast+nopersist", true, false), ("hash+nopersist", false, false),
      ("hash+persist", false, true)).foreach { case (tag, b, p) =>
      (1 to 2).foreach { i =>
        purge()
        val df = build(b, p)
        val c0 = cpuSeconds(); val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = cpuSeconds() - c0
        System.err.println(f"[walkprobe] $tag%-18s run$i wall=$wall%7.3f cpu=$cpu%7.3f")
      }
    }
    // does the memo KEY actually hit across fresh reads of the same path?
    val k1 = t("documents").select(col("doc_id"), col("source"))
      .queryExecution.analyzed.canonicalized
    val k2 = t("documents").select(col("doc_id"), col("source"))
      .queryExecution.analyzed.canonicalized
    System.err.println(s"[walkprobe] canonicalized-equal=${k1 == k2} " +
      s"hash-equal=${k1.hashCode == k2.hashCode}")

    // the memo-after-purge path ScaleCpu actually times: one persisted DF
    // object, warm it, purge all storage, re-execute the SAME object
    purge()
    val reused = build(false, true)
    reused.write.format("noop").mode("overwrite").save() // warm (fills cache)
    (1 to 2).foreach { i =>
      purge()
      val c0 = cpuSeconds(); val t0 = System.nanoTime()
      reused.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = cpuSeconds() - c0
      System.err.println(f"[walkprobe] reuse-after-purge  run$i wall=$wall%7.3f cpu=$cpu%7.3f")
    }
    // exact ScaleCpu flow over the SHIPPED query: warmup, purge, timed —
    // three repetitions; the memo inside VectorQueries is hit or missed
    // exactly as in the harness
    graft.queries.VectorQueries.clearWalkCache()
    val q = graft.queries.VectorQueries.queries("q268_semantic_pack")
    q(spark, d).write.format("noop").mode("overwrite").save() // warm
    (1 to 3).foreach { i =>
      purge()
      val c0 = cpuSeconds(); val t0 = System.nanoTime()
      q(spark, d).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = cpuSeconds() - c0
      val nCached = spark.sparkContext.getPersistentRDDs.size
      val cmEmpty = spark.sharedState.cacheManager.isEmpty
      System.err.println(f"[walkprobe] shipped-q268       run$i wall=$wall%7.3f cpu=$cpu%7.3f cachedRdds=$nCached cmEmpty=$cmEmpty")
    }
    spark.stop()
  }
}
