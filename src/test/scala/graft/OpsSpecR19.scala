package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 specs: the governance orchestrator, single-pass dirty-dir
  * detection, unattributable-row discipline (null ids / null docs), and
  * the broadcast takedown-list switch. */
class OpsSpecR19 extends AnyFunSuite {
  import SparkTestSession._

  private def msgChain(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { sb.append(cur.getMessage).append(" | "); cur = cur.getCause }
    sb.toString
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** A 3-batch admitted store under `dir`: batch=0 holds docs 1..4,
    * batch=1 docs 5..8 (doc 7 with a NULL id twin at row 9), batch=2
    * docs 10..13. */
  private def writeAdmitted(dir: String): Unit = {
    import spark.implicits._
    Seq(1L, 2L, 3L, 4L).toDF("doc_id").withColumn("payload", col("doc_id") * 10)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=0")
    Seq(Some(5L), Some(6L), Some(7L), Some(8L), None)
      .toDF("doc_id").withColumn("payload", coalesce(col("doc_id") * 10, lit(-1L)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=1")
    Seq(10L, 11L, 12L, 13L).toDF("doc_id").withColumn("payload", col("doc_id") * 10)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=2")
  }

  test("Erasure.forgetRows keeps NULL-id rows (unattributable — the " +
    "pass-through principle; r18 ADVICE), and a directory whose only " +
    "special rows are null-id never rewrites") {
    import graft.streaming.Erasure
    val dir = tmp("graft-r19-nullkeep")
    writeAdmitted(dir)
    // remove doc 6: batch=1 is dirty; its null-id row MUST survive
    assert(Erasure.forgetRows(spark, dir, "doc_id", Seq(6L)) === 1)
    val b1 = spark.read.parquet(s"$dir/batch=1")
    assert(b1.count() === 4, "only doc 6 drops; the null-id row stays")
    assert(b1.filter(col("doc_id").isNull).count() === 1,
      "the unattributable row must not be destroyed by the rewrite")
    // a takedown matching nothing: zero rewrites even though batch=1
    // still holds a null-id row (null never marks a directory dirty)
    val before = spark.read.parquet(s"$dir/batch=1")
      .orderBy(col("payload")).collect().toSeq
    assert(Erasure.forgetRows(spark, dir, "doc_id", Seq(999L)) === 0)
    val after = spark.read.parquet(s"$dir/batch=1")
      .orderBy(col("payload")).collect().toSeq
    assert(before === after)
  }

  test("Erasure.forgetRows computes the dirty-directory set in ONE job " +
    "over the store, not one probe job per directory — the r18 verdict " +
    "finding (2·B serial jobs per takedown on a long-lived gate)") {
    import graft.streaming.Erasure
    import spark.implicits._
    val dir = tmp("graft-r19-onejob")
    // 12 batch dirs, exactly one dirty
    (0 until 12).foreach { b =>
      Seq(b * 100L + 1, b * 100L + 2).toDF("doc_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=$b")
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(Erasure.forgetRows(spark, dir, "doc_id", Seq(501L)) === 1)
      Thread.sleep(1000) // let the listener bus drain
    } finally spark.sparkContext.removeSparkListener(listener)
    // one dirty-detection job + the single dirty dir's rewrite (+ at
    // most a couple of scan-planning jobs) — NEVER one per directory
    assert(jobs.get() <= 6,
      s"forgetRows launched ${jobs.get()} jobs over 12 dirs — the " +
        "per-directory probe loop is back")
    // and the other 11 dirs kept their bytes
    assert(spark.read.parquet(s"$dir/batch=3").count() === 2)
  }

  test("the takedown-list broadcast switch: a >threshold id list erases " +
    "and audits IDENTICALLY to the literal-isin regime") {
    import graft.streaming.Erasure
    val small = tmp("graft-r19-sw-small")
    val big = tmp("graft-r19-sw-big")
    writeAdmitted(small); writeAdmitted(big)
    val realIds = Seq(3L, 7L, 11L)
    // pad with ids that match nothing, pushing past the 1000 threshold
    val padded = realIds ++ (1000000L until 1001200L)
    assert(padded.size > Erasure.broadcastIdThreshold)
    val nSmall = Erasure.forgetRows(spark, small, "doc_id", realIds)
    val nBig = Erasure.forgetRows(spark, big, "doc_id", padded)
    assert(nSmall === nBig && nSmall === 3)
    val left = spark.read.option("recursiveFileLookup", "true")
      .parquet(small).orderBy(col("payload")).collect().toSeq
    val right = spark.read.option("recursiveFileLookup", "true")
      .parquet(big).orderBy(col("payload")).collect().toSeq
    assert(left === right, "surviving rows must be identical across the switch")
    assert(left.exists(_.isNullAt(0)),
      "the null-id row survives in BOTH regimes (anti join keeps nulls)")
    val certSmall = Erasure.erasureAudit(spark, realIds,
      Seq(("adm", small, "doc_id"))).collect()(0)
    val certBig = Erasure.erasureAudit(spark, padded,
      Seq(("adm", big, "doc_id"))).collect()(0)
    assert(certSmall.getLong(1) === certBig.getLong(1) &&
      certSmall.getLong(2) === 0L && certBig.getLong(2) === 0L)
  }

  test("the >threshold takedown membership runs as a BROADCAST join " +
    "(hinted, never a shuffle): the id frame is takedown-sized by " +
    "contract and must not trigger a sort-merge exchange of the store") {
    import graft.streaming.Erasure
    import spark.implicits._
    val df = spark.range(0, 100).select(col("id").as("doc_id"))
    val bigList = (0L until 1500L).toSeq
    val plan = Erasure.residualOf("s", df, col("doc_id"), bigList)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast membership join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the takedown list must never shuffle the store:\n$plan")
  }

  test("forgetDocs raises on NULL-doc index rows — the r18 ADVICE " +
    "laundering window (compaction merges a pre-r18 id-less increment " +
    "into a doc-carrying seed as doc=NULL; a bare !isin filter would " +
    "silently DESTROY that kill evidence) — and the store is intact " +
    "after the raise") {
    import graft.streaming.TextStream
    import spark.implicits._
    val dir = tmp("graft-r19-nulldoc")
    val idx = s"$dir/idx"
    def sig(doc: java.lang.Long) =
      Seq(Option(doc).map(Long2long)).toDF("doc")
        .select((col("doc") +: (0 until 4).map(j =>
          coalesce(col("doc") * 31 + j, lit(j.toLong)).as(s"s$j"))): _*)
    // inc=0: a healthy doc-carrying increment; inc=1: the laundered
    // compact output — SCHEMA has doc, one ROW is null
    sig(1L).union(sig(2L)).coalesce(1)
      .write.mode("overwrite").parquet(s"$idx/inc=0")
    sig(3L).union(sig(null)).coalesce(1)
      .write.mode("overwrite").parquet(s"$idx/inc=1")
    val e = intercept[graft.core.BadCallException] {
      TextStream.forgetDocs(spark, idx, upToBatchId = 2, ids = Seq(1L))
    }
    assert(msgChain(e).contains("NULL doc"), msgChain(e))
    // sources intact — the raise happened before the tmp write
    assert(spark.read.parquet(s"$idx/inc=0").count() === 2)
    assert(spark.read.parquet(s"$idx/inc=1").count() === 2)
    // the doc-1 signature is still there (nothing was half-forgotten)
    assert(spark.read.parquet(s"$idx/inc=0")
      .filter(col("doc") === 1L).count() === 1)
  }

  test("EmbedStream.forgetDocs runs recovery BEFORE the layout scan — a " +
    "seed published by a crashed compactor's roll-forward is " +
    "layout-checked, not invisible (r18 ADVICE)") {
    import graft.streaming.EmbedStream
    import spark.implicits._
    val dir = tmp("graft-r19-recover-first")
    val idx = s"$dir/idx"
    // a manifested compaction tmp holding the OLD (bucket, vec) layout,
    // sources already deleted — the crash-between-delete-and-rename
    // window; recovery will publish it as inc=compact-2
    val tmpDir = s"$idx/_compact-2.tmp"
    Seq((7L, Array(1.0f, 0.0f))).toDF("bucket", "vec")
      .coalesce(1).write.mode("overwrite").parquet(tmpDir)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = fs.create(new org.apache.hadoop.fs.Path(tmpDir, "_sources.txt"), true)
    try mf.write("inc=0\ninc=1".getBytes("UTF-8")) finally mf.close()
    val e = intercept[graft.core.BadCallException] {
      EmbedStream.forgetDocs(spark, idx, upToBatchId = 2, ids = Seq(1L))
    }
    assert(msgChain(e).contains("pre-r18"),
      s"the recovered seed must hit the layout guard: ${msgChain(e)}")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/inc=compact-2")),
      "recovery must have rolled the manifested tmp forward")
  }

  test("Governance.execute: the full takedown loop over all three gate " +
    "kinds + an admitted store + a published pack table from ONE " +
    "registry — one composite certificate, all residuals zero; clean " +
    "pack bins keep their bytes") {
    import graft.streaming.{Governance => G}
    import graft.ops.Chunking
    import spark.implicits._
    val root = tmp("graft-r19-gov")
    // text index: docs 1..4 across two increments
    def tsig(doc: Long) = Seq(doc).toDF("doc")
      .select((col("doc") +: (0 until 4).map(j =>
        (col("doc") * 31 + j).as(s"s$j"))): _*)
    tsig(1L).union(tsig(2L)).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/tidx/inc=0")
    tsig(3L).union(tsig(4L)).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/tidx/inc=1")
    // embed index: (bucket, vec, doc)
    Seq((0L, Array(1.0f, 0.0f), 1L), (1L, Array(0.0f, 1.0f), 5L))
      .toDF("bucket", "vec", "doc").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/eidx/inc=0")
    // media index: (doc, kind, phash)
    Seq((1L, "image", 42L), (6L, "audio", 99L)).toDF("doc", "kind", "phash")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/midx/inc=0")
    // admitted outputs: two batches, doc 1 in the first
    Seq(1L, 2L).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/adm/batch=0")
    Seq(3L, 4L).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/adm/batch=1")
    // pack table: FFD at ctx=10, published through the manifest
    val chunks = Seq(
      (1L, 0, "a", 6), (2L, 0, "b", 6), (3L, 0, "c", 4), (4L, 0, "d", 4),
      (5L, 0, "e", 3), (6L, 0, "f", 2)).toDF("doc", "chunk_idx", "chunk", "n_tok")
      .withColumn("g", lit("g"))
    val packed = Chunking.packFFD(chunks, col("g"), ctx = 10)
    graft.core.Ingest.atomicPublish(packed, s"$root/pack")
    val origPack = graft.core.Ingest.readPublished(spark, s"$root/pack")
      .collect().map(r => (r.getLong(0), r.getLong(5))).toMap // doc -> bin
    // an External store, already clean of the removed ids
    Seq(20L, 21L).toDF("doc").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/ext/part=0")
    val registry = Seq(
      G.Registry.TextIndex("text_index", s"$root/tidx", upToBatchId = 2),
      G.Registry.EmbedIndex("embed_index", s"$root/eidx", upToBatchId = 1),
      G.Registry.MediaIndex("media_index", s"$root/midx", upToBatchId = 1),
      G.Registry.Admitted("admitted", s"$root/adm", "doc_id"),
      G.Registry.Pack("pack", s"$root/pack", ctx = 10, groupCol = "grp"),
      G.Registry.External("partner_store", s"$root/ext", "doc"))
    val cert = G.execute(spark, Seq(1L), registry).collect()
    assert(cert.length === 6)
    assert(cert.map(_.getString(0)).toSeq === Seq("text_index",
      "embed_index", "media_index", "admitted", "pack", "partner_store"),
      "certificate rows in registry order")
    assert(cert.forall(_.getLong(2) === 0L), "all residuals zero")
    // doc 1 gone everywhere, other rows retained
    assert(spark.read.parquet(s"$root/tidx/inc=compact-2")
      .filter(col("doc") === 1L).count() === 0)
    assert(spark.read.parquet(s"$root/tidx/inc=compact-2").count() === 3)
    assert(spark.read.parquet(s"$root/adm/batch=0").collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
    // the superseded pack version (which still held doc 1) is VACUUMED:
    // exactly one version dir remains on disk, so the recursive audit's
    // zero residual covers every byte, not just the manifest's view
    assert(new java.io.File(s"$root/pack/data").listFiles
      .count(_.isDirectory) === 1,
      "the erase phase must vacuum the superseded pack version")
    // pack: doc 1's bin repacked (fresh id past the original max), the
    // clean bins bit-identical
    val newPack = graft.core.Ingest.readPublished(spark, s"$root/pack")
    assert(newPack.filter(col("doc") === 1L).count() === 0)
    val dirtyBin = origPack(1L)
    val maxOrig = origPack.values.max
    newPack.collect().foreach { r =>
      val (doc, bin) = (r.getLong(0), r.getLong(5))
      if (origPack(doc) == dirtyBin) assert(bin > maxOrig,
        s"dirty-bin survivor $doc must land in a fresh bin, got $bin")
      else assert(bin === origPack(doc),
        s"clean row $doc must keep bin ${origPack(doc)}, got $bin")
    }
  }

  test("Governance.execute is IDEMPOTENT — the crash-recovery story: an " +
    "operator who re-runs the whole loop after an interruption gets the " +
    "same certificate, zero admitted-store rewrites, and byte-identical " +
    "admitted directories (only the pack table gains a new version — the " +
    "manifest flip is the unit of publish)") {
    import graft.streaming.{Erasure, Governance => G}
    import spark.implicits._
    val root = tmp("graft-r19-gov-idem")
    def tsig(doc: Long) = Seq(doc).toDF("doc")
      .select((col("doc") +: (0 until 4).map(j =>
        (col("doc") * 31 + j).as(s"s$j"))): _*)
    tsig(1L).union(tsig(2L)).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/tidx/inc=0")
    Seq(1L, 2L, 3L).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/adm/batch=0")
    Seq(4L, 5L).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/adm/batch=1")
    val registry = Seq(
      G.Registry.TextIndex("tidx", s"$root/tidx", upToBatchId = 1),
      G.Registry.Admitted("adm", s"$root/adm", "doc_id"))
    val first = G.execute(spark, Seq(1L), registry).collect().toSeq
    val bytesAfterFirst = spark.read
      .option("recursiveFileLookup", "true").parquet(s"$root/adm")
      .orderBy("doc_id").collect().toSeq
    // second run: forgetRows finds no dirty dir, the index fold re-folds
    // the compact seed at the fold point (same content), certificate
    // identical
    val second = G.execute(spark, Seq(1L), registry).collect().toSeq
    assert(first.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ===
      second.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    val bytesAfterSecond = spark.read
      .option("recursiveFileLookup", "true").parquet(s"$root/adm")
      .orderBy("doc_id").collect().toSeq
    assert(bytesAfterFirst === bytesAfterSecond)
    // and the second run touched zero admitted dirs (no dirty dir exists)
    assert(Erasure.forgetRows(spark, s"$root/adm", "doc_id", Seq(1L)) === 0)
  }

  test("Governance.executeFromRequests: the erase runs from the SAME " +
    "request store the TakedownStream bill was computed over — ids " +
    "never hand-copied; duplicate/overlapping request increments " +
    "collapse to one distinct set, and the empty-store / data-sized " +
    "valves raise loudly") {
    import graft.streaming.{Governance => G}
    import spark.implicits._
    val root = tmp("graft-r19-gov-req")
    Seq(1L, 2L, 3L, 4L).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/adm/batch=0")
    // request increments as TakedownStream writes them: doc 1 arrives
    // twice across triggers (a duplicated request is a no-op)
    Seq(1L).toDF("doc").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/req/inc=0")
    Seq(1L, 3L).toDF("doc").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/req/inc=1")
    val registry = Seq(
      G.Registry.Admitted("adm", s"$root/adm", "doc_id"))
    val cert = G.executeFromRequests(spark, s"$root/req", registry)
      .collect()
    assert(cert.length === 1 && cert(0).getLong(2) === 0L)
    assert(spark.read.parquet(s"$root/adm/batch=0")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L, 4L),
      "docs 1 and 3 (the distinct request set) erased, 2 and 4 retained")
    // empty request store: loud, never a silent no-op "success"
    val e1 = intercept[IllegalArgumentException] {
      G.executeFromRequests(spark, s"$root/empty", registry)
    }
    assert(msgChain(e1).contains("no request increments"), msgChain(e1))
    // a data-sized "request" table is a mis-pointed directory
    spark.range(0, 50).select(col("id").as("doc")).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/big/inc=0")
    val e2 = intercept[IllegalArgumentException] {
      G.executeFromRequests(spark, s"$root/big", registry, maxIds = 10)
    }
    assert(msgChain(e2).contains("corpus-shaped"), msgChain(e2))
  }

  test("Governance: a registered store the loop cannot erase (an " +
    "External store whose owner did NOT erase it) FAILS the composite " +
    "audit loudly — and a store left OFF the registry is exactly what " +
    "auditOnly over the full registry exposes") {
    import graft.streaming.{Governance => G}
    import spark.implicits._
    val root = tmp("graft-r19-gov-fail")
    Seq(1L, 2L).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/adm/batch=0")
    // the partner store still HOLDS removed doc 1
    Seq(1L, 20L).toDF("doc").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/ext/part=0")
    val admitted = G.Registry.Admitted("admitted", s"$root/adm", "doc_id")
    val partner = G.Registry.External("partner_store", s"$root/ext", "doc")
    val e = intercept[graft.core.BadCallException] {
      G.execute(spark, Seq(1L), Seq(admitted, partner))
    }
    assert(msgChain(e).contains("partner_store"),
      s"the failure must NAME the residual store: ${msgChain(e)}")
    // the operator-error scenario the orchestrator exists to prevent:
    // running the loop with a store missing from the registry LOOKS
    // green (its certificate covers only what it was handed) — the
    // composite audit over the FULL registry is what catches it
    val rootB = tmp("graft-r19-gov-skip")
    Seq(1L, 2L).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$rootB/adm/batch=0")
    Seq(1L, 3L).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$rootB/adm2/batch=0")
    val a1 = G.Registry.Admitted("adm1", s"$rootB/adm", "doc_id")
    val a2 = G.Registry.Admitted("adm2", s"$rootB/adm2", "doc_id")
    val partial = G.execute(spark, Seq(1L), Seq(a1)).collect()
    assert(partial.forall(_.getLong(2) === 0L),
      "the partial registry's own certificate is (correctly) green")
    val full = G.auditOnly(spark, Seq(1L), Seq(a1, a2)).collect()
    assert(full.find(_.getString(0) == "adm2").get.getLong(2) === 1L,
      "the skipped store's residual is visible the moment it is registered")
    // an UN-VACUUMED hand repack: the operator republished a clean
    // current version but the superseded one still holds removed rows —
    // the recursive pack audit sees the dirty bytes the manifest hides,
    // and execute() heals it (repack no-op + vacuum) to a zero
    // certificate over ONE remaining version
    import graft.ops.Chunking
    val rootC = tmp("graft-r19-gov-unvac")
    val chunksC = Seq((1L, 0, "a", 4), (2L, 0, "b", 4))
      .toDF("doc", "chunk_idx", "chunk", "n_tok").withColumn("g", lit("g"))
    val packC = Chunking.packFFD(chunksC, col("g"), ctx = 8)
    graft.core.Ingest.atomicPublish(packC, s"$rootC/pack")
    graft.core.Ingest.atomicPublish(packC.filter(col("doc") =!= 1L),
      s"$rootC/pack") // hand repack, NO vacuum
    val packReg = Seq(G.Registry.Pack("pack", s"$rootC/pack", ctx = 8))
    val dirtyBytes = G.auditOnly(spark, Seq(1L), packReg).collect()(0)
    assert(dirtyBytes.getLong(2) === 1L,
      "the superseded version's removed rows must show as residual")
    val healed = G.execute(spark, Seq(1L), packReg).collect()(0)
    assert(healed.getLong(2) === 0L)
    assert(new java.io.File(s"$rootC/pack/data").listFiles
      .count(_.isDirectory) === 1,
      "execute must vacuum down to one clean version")
  }
}
