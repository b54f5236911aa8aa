package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Similarity => Sim}

/** Round-18 operator specs: marginMine's pre-counted valve, the
  * exhaustive forget fold's raise discipline, and the r18 governance /
  * assembly additions. */
class OpsSpecR18 extends AnyFunSuite {
  import SparkTestSession._

  private def msgChain(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { sb.append(cur.getMessage).append(" | "); cur = cur.getCause }
    sb.toString
  }

  test("marginMine knownCounts (r17 verdict #7): provided side counts " +
    "skip the two count() jobs with IDENTICAL valve behavior — over-valve " +
    "counts raise (overflow-safe message), under-valve counts mine the " +
    "same pairs as the counted path") {
    import spark.implicits._
    val s = Seq((0L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vid", "v")
    val t = Seq((1L, Array(1.0f, 0.0f)), (3L, Array(0.6f, 0.8f)))
      .toDF("vid", "v")
    // over-valve via provided counts: raises WITHOUT any Spark job, and
    // the pair product in the message survives Long overflow (r17 ADVICE
    // low: nS * nT printed negative for extreme sides)
    val e = intercept[Exception] {
      Sim.marginMine(s, col("vid"), col("v"), t, col("vid"), col("v"),
        k = 2, maxPairs = 64000000L,
        knownCounts = Some((4000000000L, 4000000000L)))
    }
    assert(msgChain(e).contains("kernel valve"), msgChain(e))
    assert(msgChain(e).contains("16000000000000000000"),
      s"the raise message must print the exact pair product, not a " +
        s"Long-overflow negative: ${msgChain(e)}")
    // under-valve provided counts mine identically to the counted path
    val counted = Sim.marginMine(s, col("vid"), col("v"), t, col("vid"),
      col("v"), k = 2).orderBy("sid").collect().toSeq
    val preCounted = Sim.marginMine(s, col("vid"), col("v"), t, col("vid"),
      col("v"), k = 2, knownCounts = Some((2L, 2L)))
      .orderBy("sid").collect().toSeq
    assert(counted === preCounted,
      "knownCounts must change valve accounting only, never the mining")
  }

  test("forget fold (foldAll) raises instead of under-forgetting: a " +
    "numeric increment AT or ABOVE the fold point (gate still writing / " +
    "stale upTo) is a typed error, never a silent partial forget") {
    import graft.streaming.TextStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-forget-raise")
    val idx = dir.resolve("idx").toString
    def sigRows(doc: Long) =
      Seq(doc).toDF("doc").select(
        (col("doc") +: (0 until 16).map(j => (col("doc") * 31 + j)
          .as(s"s$j"))): _*)
    sigRows(1L).write.parquet(s"$idx/inc=0")
    sigRows(2L).write.parquet(s"$idx/inc=1")
    val e = intercept[Exception] {
      TextStream.forgetDocs(spark, idx, upToBatchId = 1, ids = Seq(1L))
    }
    assert(msgChain(e).contains("unfolded"), msgChain(e))
    // both increments intact after the raise — nothing was half-folded
    val tags = new java.io.File(idx).listFiles
      .map(_.getName).filter(_.startsWith("inc=")).sorted.toSeq
    assert(tags === Seq("inc=0", "inc=1"), tags.toString)
    // the correct call folds BOTH (exhaustive), filters doc 1, one seed
    assert(TextStream.forgetDocs(spark, idx, upToBatchId = 2,
      ids = Seq(1L)) === 2)
    val after = new java.io.File(idx).listFiles
      .map(_.getName).filter(_.startsWith("inc=")).sorted.toSeq
    assert(after === Seq("inc=compact-2"), after.toString)
    assert(spark.read.parquet(s"$idx/inc=compact-2")
      .select("doc").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("forget fold folds caller-written SEEDS too (arbitrary tags): a " +
    "takedown must erase the doc from inc=seed increments, not only " +
    "numeric batches") {
    import graft.streaming.TextStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-forget-seed")
    val idx = dir.resolve("idx").toString
    def sigRows(docs: Seq[Long]) =
      docs.toDF("doc").select(
        (col("doc") +: (0 until 16).map(j => (col("doc") * 31 + j)
          .as(s"s$j"))): _*)
    sigRows(Seq(1L, 2L)).write.parquet(s"$idx/inc=seed")
    sigRows(Seq(3L)).write.parquet(s"$idx/inc=0")
    assert(TextStream.forgetDocs(spark, idx, upToBatchId = 1,
      ids = Seq(2L)) === 2)
    assert(spark.read.parquet(s"$idx/inc=compact-1")
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 3L),
      "the seed's doc 2 must be gone, docs 1 and 3 retained")
  }

  test("EmbedStream.forgetDocs raises on a pre-r18 (bucket, vec) store " +
    "with the rebuild migration path, sources intact") {
    import graft.streaming.EmbedStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-embed-old")
    val idx = dir.resolve("idx").toString
    Seq((0L, Array(1.0f, 0.0f))).toDF("bucket", "vec")
      .write.parquet(s"$idx/inc=0")
    val e = intercept[Exception] {
      EmbedStream.forgetDocs(spark, idx, upToBatchId = 1, ids = Seq(1L))
    }
    assert(msgChain(e).contains("pre-r18"), msgChain(e))
    val tags = new java.io.File(idx).listFiles
      .map(_.getName).filter(_.startsWith("inc=")).sorted.toSeq
    assert(tags === Seq("inc=0"), "sources must be intact after the raise")
  }
}
