package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Micro-benchmarks for the native Catalyst expressions vs their composable
  * built-in-function twins: `cosine_sim` (vs `zip_with`+`aggregate`) on the
  * blocked all-pairs workload, and `word_shingles` (vs the
  * `transform`+`slice` lambda form, which re-splits the document once per
  * shingle). Prints one JSON line per comparison. */
object BenchMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-bench-micro")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()
    def timeShingle(fast: Boolean): Double = {
      val c = if (fast) Dedup.shingles(col("text"), 3)
              else Dedup.shinglesComposable(col("text"), 3)
      docs.select(explode(c)).count()
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => docs.select(explode(c)).count())
      (System.nanoTime() - t0) / 3e9
    }
    graft.GraftExtensions.ensureRegistered(spark)
    val shComposed = timeShingle(fast = false)
    val shNative = timeShingle(fast = true)
    println(s"""{"metric":"shingle_micro","composed_sec":$shComposed,"native_sec":$shNative,"speedup":${shComposed / shNative},"sf":"$sfDir"}""")
    // rolling hash: native O(L) codepoint walk vs the composable fold's
    // O(L²) per-character substrs + per-row long-array materialization
    def timeRolling(fast: Boolean): Double = {
      val c = if (fast) graft.ops.TextAnalysis.rollingFingerprint(col("text"))
              else graft.functions.PortableHash.rollingHashComposable(col("text"))
      docs.select(sum(c)).collect()
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => docs.select(sum(c)).collect())
      (System.nanoTime() - t0) / 3e9
    }
    val rhComposed = timeRolling(fast = false)
    val rhNative = timeRolling(fast = true)
    println(s"""{"metric":"rolling_hash_micro","composed_sec":$rhComposed,"native_sec":$rhNative,"speedup":${rhComposed / rhNative},"sf":"$sfDir"}""")
    docs.unpersist()
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
