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

  test("repackDirty: clean bins come back BIT-IDENTICAL under their " +
    "original ids, removed rows drop, dirty-bin survivors re-pack into " +
    "fresh ids past max(original bin), and tokens conserve exactly") {
    import graft.ops.Chunking
    import spark.implicits._
    // group g: bins are driven by FFD at ctx=10 over hand-sized chunks
    val chunks = Seq(
      (1L, 0, "a", 6), (2L, 0, "b", 6), (3L, 0, "c", 4), (4L, 0, "d", 4),
      (5L, 0, "e", 3), (6L, 0, "f", 2)).toDF("doc", "chunk_idx", "chunk", "n_tok")
      .withColumn("g", lit("g"))
    val packed = Chunking.packFFD(chunks, col("g"), ctx = 10)
    val orig = packed.collect().map(r =>
      (r.getLong(0), r.getLong(5))).toMap // doc -> bin
    // remove doc 2: its bin is dirty, every other bin must be untouched
    val out = Chunking.repackDirty(packed, col("grp"), col("bin"),
      col("doc") === 2L, ctx = 10)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(5),
      r.getBoolean(6))) // (doc, bin, repacked)
    assert(!rows.exists(_._1 == 2L), "removed row must be gone")
    val dirtyBin = orig(2L)
    val cleanOut = rows.filter(!_._3)
    assert(cleanOut.forall { case (d, b, _) =>
      orig(d) == b && orig(d) != dirtyBin },
      "clean rows keep their original bins, none from the dirty bin")
    val maxOrig = orig.values.max
    val repackedOut = rows.filter(_._3)
    assert(repackedOut.nonEmpty &&
      repackedOut.forall { case (d, b, _) =>
        orig(d) == dirtyBin && b > maxOrig },
      s"dirty-bin survivors get fresh ids past $maxOrig: " +
        repackedOut.mkString(", "))
    // token conservation: out = in - removed
    val inTok = packed.agg(sum("n_tok")).collect()(0).getLong(0)
    val outTok = out.agg(sum("n_tok")).collect()(0).getLong(0)
    val rmTok = packed.filter(col("doc") === 2L)
      .agg(sum("n_tok")).collect()(0).getLong(0)
    assert(outTok === inTok - rmTok, "token conservation")
    // every new bin still respects ctx
    val binLoads = out.groupBy("grp", "bin").agg(sum("n_tok").as("t"))
      .collect().map(_.getLong(2))
    assert(binLoads.forall(_ <= 10), "no repacked bin may exceed ctx")
  }

  test("prefixCacheSchedule: per-row conservation cached + computed = " +
    "tokens, group sums equal prefixCacheReport's totals (shared core), " +
    "first prompt of each group serves fully computed") {
    import graft.ops.Chunking
    import spark.implicits._
    val prompts = Seq(
      ("a", "x y z"), ("a", "x y z w"), ("a", "x q"), ("a", "x y z"),
      ("b", "hello"), ("b", "hello world")).toDF("g", "p")
    val sched = Chunking.prefixCacheSchedule(prompts, col("g"), col("p"))
    val rows = sched.collect()
    assert(rows.forall(r => r.getLong(4) + r.getLong(5) === r.getLong(3)),
      "cached + computed = n_tokens on every row")
    val first = sched.filter(col("serve_order") === 1L).collect()
    assert(first.forall(r => r.getLong(4) === 0L),
      "the group's first prompt saves nothing")
    // exact-duplicate prompt ('x y z' twice in group a) is a full hit
    assert(rows.exists(r => r.getString(0) == "a" &&
      r.getString(2) == "x y z" && r.getLong(4) === 3L),
      "an identical prompt must cache its full length")
    val fromSched = sched.groupBy("grp")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"),
        org.apache.spark.sql.functions.sum("cached_tokens").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val fromReport = Chunking.prefixCacheReport(prompts, col("g"), col("p"))
      .select("grp", "total_tokens", "cached_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromSched === fromReport,
      "schedule column sums must equal the report's group totals")
  }

  test("admitStepMedia: kind separation — identical 64-bit hashes in " +
    "different kinds never kill each other; within a kind the smaller " +
    "id wins at Hamming <= maxHamming") {
    import graft.ops.Dedup
    import spark.implicits._
    val batch = Seq(
      (1L, "image", 100L), (2L, "image", 101L),  // Hamming(100,101)=1
      (3L, "audio", 100L),                       // image 1's hash, audio
      (4L, "video", 100L)                        // and video
    ).toDF("doc", "kind", "phash")
    val empty = spark.range(0).select(col("id").as("doc"),
      lit("").as("kind"), col("id").as("phash"))
    val got = Dedup.admitStepMedia(batch, empty, maxHamming = 1)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 3L, 4L),
      "2 dies to 1 within-kind; 3 and 4 admit despite the identical hash")
  }

  test("Erasure.forgetRows composes with the IVF serving index: a " +
    "vector takedown rewrites only the dirty cluster= partitions in " +
    "place — no retrain, no rebuild — and probes never return the " +
    "forgotten id again") {
    import graft.streaming.Erasure
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("ivf-forget").toString
    Sim.ivfWritePartitioned(emb, col("vec_id"), col("embedding"), 4,
      s"$dir/idx")
    val q = emb.filter(col("vec_id") === 7)
    val top = Sim.ivfTopKPartitioned(spark, s"$dir/idx", q,
        col("embedding"), nProbe = 4, k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top.head === 7L, "self-query must return itself first")
    val nBefore = spark.read.parquet(s"$dir/idx").count()
    assert(Erasure.forgetRows(spark, s"$dir/idx", "id", Seq(7L),
      prefix = "cluster=") === 1,
      "exactly the one dirty inverted list rewrites")
    assert(spark.read.parquet(s"$dir/idx").count() === nBefore - 1)
    val after = Sim.ivfTopKPartitioned(spark, s"$dir/idx", q,
        col("embedding"), nProbe = 4, k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(!after.contains(7L) && after.size === 3,
      s"the forgotten vector must never serve again: $after")
    assert(after === top.filterNot(_ == 7L) :+ after.last,
      "surviving neighbours keep their relative order")
    // the trained sidecars are untouched — no retrain happened
    assert(spark.read.parquet(s"$dir/idx.centroids").count() === 4L)
    // and the certificate over the index reads zero residual
    val cert = Erasure.erasureAudit(spark, Seq(7L),
        Seq(("ivf", s"$dir/idx", "id")))
      .collect()(0)
    assert(cert.getLong(1) === nBefore - 1 && cert.getLong(2) === 0L)
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
