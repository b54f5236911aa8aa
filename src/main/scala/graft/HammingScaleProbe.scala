package graft
// Dev scaling probe (r12): measures simhash pair mining at the
// production signature width (60 bits — the portable-hash maximum)
// vs the 16-bit oracle-replayable configuration, at two SFs. Evidence
// behind README's scaling-table row for q93: the 16-bit keyspace
// saturates by the birthday bound (same-value collisions go
// quadratic); the wide signature scales sublinearly.
import org.apache.spark.sql.functions._
object HammingScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("graft-h64")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def run(bits: Int): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = graft.ops.Dedup.simhashPairs(docs, col("doc_id"),
          col("text"), bits = bits, maxHamming = 3).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      run(60) // warmup
      val (n64, t64) = run(60)
      val (n16, t16) = run(16)
      println(f"[h64] $dir bits=60: $n64 pairs in $t64%.2f s; " +
        f"bits=16: $n16 pairs in $t16%.2f s")
    }
    spark.stop()
  }
}

// Same evidence for q65's embedding dedup (r13): its oracle-replayable
// bits=4 sign-LSH has 16 buckets total, so candidate pairs grow
// quadratically with corpus density — the q93 saturation class, not a
// plan defect. The production-width run (bits=12, 4096 buckets) at the
// same two SFs shows the op itself scales.
object EmbedScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("graft-embprobe")
    import org.apache.spark.sql.functions._
    for (dir <- args) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      def run(bits: Int): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = graft.ops.Dedup.dedupByEmbedding(emb, col("vec_id"),
          col("embedding"), bits = bits, minCosine = 0.25).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      run(12) // warmup
      val (n12, t12) = run(12)
      val (n4, t4) = run(4)
      println(f"[embprobe] $dir bits=12: $n12 kept in $t12%.2f s; " +
        f"bits=4: $n4 kept in $t4%.2f s")
    }
    spark.stop()
  }
}
