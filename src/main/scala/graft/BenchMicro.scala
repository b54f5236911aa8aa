package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Micro-benchmark: native codegen'd `cosine_sim` expression vs the
  * composable `zip_with`+`aggregate` form, on the blocked all-pairs workload
  * (the heaviest cosine consumer). Prints one JSON line. */
object BenchMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-bench-micro")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    embs.count()
    def time(native: Boolean): Double = {
      // bits=2 → 4 buckets → ~n²/8 within-bucket pairs: cosine-dominated
      Similarity.bucketedPairs(embs, col("vec_id"), col("embedding"), bits = 2,
        native = native).agg(sum("cos")).collect()
      val t0 = System.nanoTime()
      (1 to 3).foreach { _ =>
        Similarity.bucketedPairs(embs, col("vec_id"), col("embedding"), bits = 2,
          native = native).agg(sum("cos")).collect()
      }
      (System.nanoTime() - t0) / 3e9
    }
    val composed = time(native = false)
    val native = time(native = true)
    println(s"""{"metric":"cosine_micro","composed_sec":$composed,"native_sec":$native,"speedup":${composed / native},"sf":"$sfDir"}""")
    spark.stop()
  }
}
