package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.ops.{Similarity, Skew}

/** Scale-path specs: salted aggregation/join equivalence, true multi-shard
  * tables, bucketed co-located joins, IVF ANN degradation to exact. */
class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("salted aggregate equals direct groupBy exactly") {
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("c"),
        min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
      .orderBy("l_returnflag").collect()
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"),
        Seq(("l_quantity", "sum", "s"), ("l_orderkey", "count", "c"),
          ("l_extendedprice", "min", "mn"), ("l_extendedprice", "max", "mx")),
        saltBuckets = 16)
      .orderBy("l_returnflag").collect()
    assert(salted.toSeq === direct.toSeq)
  }

  test("salted join equals direct join exactly") {
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val direct = ord.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect()
    val salted = Skew.saltedJoin(
        ord.withColumnRenamed("o_custkey", "k"),
        cust.withColumnRenamed("c_custkey", "k"), "k", saltBuckets = 8)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect()
    assert(salted.toSeq === direct.toSeq)
  }

  test("multi-shard table: merged groupby equals single-file; concat keeps per-shard rows") {
    val dir = Files.createTempDirectory("graft-shards").toString
    li.repartition(4).write.mode("overwrite").parquet(dir)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(shards.length === 4)
    val merged = GroupByEngine.groupby(spark, shards, Seq("l_returnflag"),
      Seq(AggSpec("l_quantity", "sum", "s"), AggSpec("l_orderkey", "count", "c"))).get
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count("l_orderkey").as("c"))
    assert(merged.orderBy("l_returnflag").collect().toSeq ===
      direct.orderBy("l_returnflag").collect().toSeq)
    // concat fidelity: per-shard aggregates survive, re-merge equals direct
    val concat = GroupByEngine.groupby(spark, shards, Seq("l_returnflag"),
      Seq(AggSpec("l_quantity", "sum", "s")), combine = CombineMode.Concat).get
    val nGroups = direct.count()
    assert(concat.count() > nGroups && concat.count() <= nGroups * 4)
    val remerged = concat.groupBy("l_returnflag").agg(sum("s").as("s"))
    assert(remerged.orderBy("l_returnflag").collect().map(_.getDouble(1)).toSeq ===
      direct.orderBy("l_returnflag").collect().map(_.getDouble(1)).toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(s"$sf/orders.parquet")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("b_orders")
      spark.read.parquet(s"$sf/customer.parquet")
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("b_customer")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === spark.read.parquet(s"$sf/orders.parquet").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("z-order layout keeps BOTH dimensions compact per file; plain sort does not") {
    import graft.ops.Layout
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(pmod(col("o_custkey"), lit(65536L)).as("a"),
        pmod(datediff(col("o_orderdate"), to_date(lit("1995-01-01"))),
          lit(65536)).cast("long").as("b"))
    def spans(path: String): (Double, Double) = {
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .collect()
      (byFile.map(_.getLong(1)).sum.toDouble / byFile.length,
        byFile.map(_.getLong(2)).sum.toDouble / byFile.length)
    }
    // 32 files = 5 z-prefix bits → ~2-3 bits of clustering per dimension;
    // at 8 files the floor is only global/2 per dim, too coarse to assert on
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.writeZOrdered(o, s"$dir/z", col("a"), col("b"), files = 32)
    o.repartitionByRange(32, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/plain")
    val (za, zb) = spans(s"$dir/z")
    val (pa, pb) = spans(s"$dir/plain")
    // plain sort: a compact but b spans ~everything per file. z-order: both
    // dimensions bounded — the b-span must shrink by a wide margin while a
    // stays far below its global range
    assert(pa <= za, "plain sort should be at least as compact on its own key")
    assert(zb < pb / 2.0,
      s"z-order should bound the second dimension: z=$zb plain=$pb")
    val globalA = o.agg(max("a") - min("a")).head.getLong(0).toDouble
    assert(za < globalA / 2.0, s"zorder a-span $za vs global $globalA")
  }

  test("as-of join matches brute-force temporal lookup") {
    import graft.ops.AsOf
    val ev = graft.queries.QueryUtil.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("us"), col("us").as("sus"))
    val got = AsOf.asOfJoin(ev, signups, "user_id", col("us"), col("us"), "sus")
      .select("event_id", "asof_sus").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val all = ev.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = all.groupBy(_._2)
    all.foreach { case (id, user, _, us) =>
      val want = byUser(user).filter(e => e._3 == "signup" && e._4 <= us)
        .map(_._4).maxOption
      assert(got(id) === want, s"event $id")
    }
  }

  test("hive-partitioned write enables partition pruning in the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("order_year", year(col("o_orderdate")))
    Ingest.distribute(ord, dir, partitionBy = Seq("order_year"))
    val pruned = spark.read.parquet(dir).filter(col("order_year") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("order_year"),
      s"expected partition pruning in:\n$plan")
    assert(pruned.count() === ord.filter(col("order_year") === 1997).count())
  }

  /** Set session confs for the body, restoring prior values after. */
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    // get() can return null (conf defined but unset) — treat as absent
    val olds = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_)) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("non-hinted join degrades broadcast→SMJ when the dim outgrows the " +
    "threshold, same answer") {
    // the 100 TB failure mode this guards: a "dimension" that grew past
    // executor memory must fall back to a shuffle join, not OOM a broadcast.
    // Joins built WITHOUT an explicit broadcast() hint leave the choice to
    // Catalyst's size estimate — threshold -1 simulates "too big" and the
    // SAME code must plan an SMJ and return identical rows.
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    def q = ord.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
    val fast = q
    val base = fast.collect()
    assert(fast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "customer is small here: the default plan must broadcast it")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val slow = q
      val rows = slow.collect()
      val p = slow.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        s"with broadcast off the join must degrade to SMJ:\n$p")
      assert(rows.toSeq === base.toSeq,
        "degraded plan must return identical rows")
    }
  }

  test("runtime bloom filter from the selective dim side prunes the fact scan, same answer") {
    // the 100 TB shuffle-join complement to DPP: when the fact side is NOT
    // partitioned by the join key, Spark can still inject a bloom filter
    // built from the dim side's selective predicate and drop fact rows at
    // the scan, before the shuffle. Pinning that our plans stay eligible
    // (plain equi-join + dim predicate, no hint) and that the filtered plan
    // returns identical rows.
    val ordSel = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    def q = li.select(col("l_orderkey"), col("l_quantity"))
      .join(ordSel, col("l_orderkey") === col("o_orderkey"))
      .agg(sum("l_quantity").as("s"))
    val base = q.collect()
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val fil = q
      val p = fil.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"fact side must carry an injected runtime bloom filter:\n$p")
      assert(fil.collect().toSeq === base.toSeq,
        "bloom-filtered plan must return identical rows")
    }
  }

  test("AQE splits a skewed SMJ partition at runtime (skew=true in final plan)") {
    // one pathologically hot key: 60k of 70k left rows share key 0, with a
    // payload fat enough that the hot post-shuffle partition crosses the
    // (lowered) skew threshold. Broadcast disabled so the join is an SMJ —
    // the only shape AQE skew-splitting applies to.
    val left = spark.range(0, 70000)
      .select(when(col("id") < 60000, 0L).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("pay"))
    val right = spark.range(0, 1000).select(col("id").as("k"),
      col("id").cast("string").as("attr"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256k",
      // coalescing can mask the skew detection on tiny test data
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = left.join(right, "k")
      // collect() (not count()) so the inspected QueryExecution is the one
      // that ran — count() plans its own query and the join's AQE plan
      // would never finalize. Left keys: 0 (60k rows, matches right's 0) +
      // 60000..69999 (no match).
      assert(joined.collect().length === 60000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the hot partition's join skew=true:\n$p")
    }
  }

  test("dynamic partition pruning: a selective dim filter prunes fact " +
    "partitions at runtime") {
    // the partitioned-layout payoff beyond static pruning: the filter is on
    // the DIM (d_attr), not the fact — only DPP can skip fact partitions,
    // by piping the dim's surviving keys into the scan as a runtime filter.
    val dir = Files.createTempDirectory("graft-dpp").toString + "/fact"
    spark.range(0, 10000)
      .select(col("id"), (col("id") % 20).as("part_key"))
      .write.partitionBy("part_key").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(0, 20).select(col("id").as("d_key"),
      (col("id") % 10).as("d_attr"))
    val q = fact.join(dim, col("part_key") === col("d_key"))
      .filter(col("d_attr") === 3)
    // d_attr=3 survives for d_key ∈ {3, 13} → 2 of 20 partitions, 500 rows each
    assert(q.count() === 1000L)
    val p = q.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamic pruning predicate:\n$p")
  }

  test("ivf with full probe equals brute force; partial probe has sane recall") {
    val q = embs.filter(col("vec_id") === 0)
    val body = embs.filter(col("vec_id") =!= 0)
    val brute = Similarity.bruteForceTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), 10).collect().map(_.getLong(0)).toSeq
    val full = Similarity.ivfTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), nCentroids = 8, nProbe = 8, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(full === brute) // exhaustive probe ≡ exact search
    val partial = Similarity.ivfTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), nCentroids = 8, nProbe = 3, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(partial.nonEmpty && partial.subsetOf(
      Similarity.bruteForceTopK(body, col("vec_id"), col("embedding"),
        q, col("embedding"), 500).collect().map(_.getLong(0)).toSet))
  }

  test("pq: deterministic training, full-candidate serve equals brute force, persisted codes serve identically") {
    val q = embs.filter(col("vec_id") === 0)
    val body = embs.filter(col("vec_id") =!= 0)
    val model = Similarity.pqTrain(body, col("vec_id"), col("embedding"), m = 16, ks = 16)
    // deterministic: same data + params → bit-identical codebooks
    val model2 = Similarity.pqTrain(body, col("vec_id"), col("embedding"), m = 16, ks = 16)
    assert(model.codebooks.flatten.flatten.toSeq === model2.codebooks.flatten.flatten.toSeq)
    // degenerate candidates=|table| ≡ exact brute force (same contract as
    // IVF's full probe): ADC ranks everything, exact re-rank fixes order
    val brute = Similarity.bruteForceTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val n = body.count().toInt
    val full = Similarity.pqTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), model, nCandidates = n, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === brute)
    // offline/online split: persisted codes + model sidecar serve bit-equal
    // to the in-memory path, and the codes table is (id, codes<tinyint×m>)
    // — m bytes per row, the 16× serving shrink
    val dir = Files.createTempDirectory("graft-pq").toString + "/emb"
    Similarity.pqWriteEncoded(body, col("vec_id"), col("embedding"), model, dir)
    val back = Similarity.pqReadModel(spark, dir)
    assert(back.m === model.m && back.ds === model.ds && back.ks === model.ks)
    assert(back.codebooks.flatten.flatten.toSeq === model.codebooks.flatten.flatten.toSeq)
    val codes = spark.read.parquet(dir)
    assert(codes.columns.toSeq === Seq("id", "codes"))
    assert(codes.schema("codes").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType === org.apache.spark.sql.types.ByteType)
    assert(codes.select(org.apache.spark.sql.functions.size(col("codes")))
      .distinct().collect().map(_.getInt(0)).toSeq === Seq(16))
    val served = Similarity.pqTopKOnCodes(codes, col("id"), col("codes"),
      body, col("vec_id"), col("embedding"), q, col("embedding"), back, 100, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inmem = Similarity.pqTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), model, nCandidates = 100, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === inmem)
    // typed errors: foreign/missing manifest, query-dim mismatch
    import spark.implicits._
    val badDim = intercept[graft.core.BadCallException] {
      Similarity.pqTopKOnCodes(codes, col("id"), col("codes"),
        body, col("vec_id"), col("embedding"),
        Seq(Tuple1(Array(1f, 2f))).toDF("qv"), col("qv"), back, 10, 10)
    }
    assert(badDim.getMessage.contains("query dim 2"))
    val noManifest = intercept[graft.core.BadCallException] {
      Similarity.pqReadModel(spark, dir + "-nope")
    }
    assert(noManifest.getMessage.contains("no PQ manifest"))
  }

  test("ivf append: no-retrain batch add lands in persisted clusters, full probe equals brute force over the union") {
    val dir = Files.createTempDirectory("graft-ivf-app").toString + "/emb"
    val q = embs.filter(col("vec_id") === 0)
    val first = embs.filter(col("vec_id") =!= 0 && col("vec_id") < 300)
    val rest = embs.filter(col("vec_id") >= 300)
    Similarity.ivfWritePartitioned(first, col("vec_id"), col("embedding"), 6, dir,
      kmeansIters = 2)
    Similarity.ivfAppendPartitioned(rest, col("vec_id"), col("embedding"), dir)
    // full probe over the appended index ≡ brute force over old ∪ new
    val got = Similarity.ivfTopKPartitioned(spark, dir, q, col("embedding"),
      nProbe = 6, k = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.bruteForceTopK(embs.filter(col("vec_id") =!= 0),
      col("vec_id"), col("embedding"), q, col("embedding"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === brute)
    // an appended copy of a known vector lands in ITS cluster: probing for
    // it at nProbe=1 surfaces the copy (same argmax as the original)
    import spark.implicits._
    val probeVec = embs.filter(col("vec_id") === 42).select(col("embedding"))
    val copy = probeVec.select(lit(999999L).as("vec_id"),
      col("embedding"), lit(0).as("label"))
    Similarity.ivfAppendPartitioned(copy, col("vec_id"), col("embedding"), dir)
    val hit = Similarity.ivfTopKPartitioned(spark, dir, probeVec,
      col("embedding"), nProbe = 1, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(hit.contains(999999L) && hit.contains(42L),
      s"appended copy must be probeable in its original's cluster: $hit")
    // dimension guard: driver-side fast-fail on a uniformly-wrong batch
    val bad = intercept[graft.core.BadCallException] {
      Similarity.ivfAppendPartitioned(
        Seq((1L, Array(1f, 2f), 0)).toDF("vec_id", "embedding", "label"),
        col("vec_id"), col("embedding"), dir)
    }
    assert(bad.getMessage.contains("append batch has 2"))
    // dimension guard: a MIXED batch (first row correct, later row wrong)
    // slips past the sampled fast-fail but the in-pass per-row guard
    // aborts the append before any corrupt row lands
    val dim = embs.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head.getInt(0)
    val mixed = embs.filter(col("vec_id") === 7)
      .select(col("vec_id"), col("embedding"), lit(0).as("label"))
      .union(Seq((888888L, Array(1f, 2f), 0)).toDF("vec_id", "embedding", "label"))
    val preCount = spark.read.parquet(dir).count()
    val mixedErr = intercept[Exception] {
      Similarity.ivfAppendPartitioned(mixed, col("vec_id"), col("embedding"), dir)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(mixedErr).exists(_.contains("append row has 2")),
      s"want the per-row dim error, got: ${mixedErr.getMessage}")
    assert(spark.read.parquet(dir).count() === preCount,
      "a failed mixed-dim append must not grow the index")
  }

  test("incremental semantic dedup: batch-vs-index drops exactly the planted " +
    "copies; appended members catch later copies without retraining") {
    import graft.ops.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-semincr").toString + "/emb"
    val corpus = embs.filter(col("vec_id") < 400)
    Similarity.ivfWritePartitioned(corpus, col("vec_id"), col("embedding"), 8,
      dir, kmeansIters = 4)
    // batch 1: 3 planted copies of indexed vectors + the genuinely new tail
    val planted = corpus.filter(col("vec_id") < 3)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"), col("label"))
    val batch1 = embs.filter(col("vec_id") >= 400).unionByName(planted)
    val s1 = Dedup.semanticDedupAgainstIndex(batch1, col("vec_id"),
        col("embedding"), dir, minCosine = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(s1.forall(_ < 200000L), s"planted copies must drop: ${s1.filter(_ >= 200000L)}")
    assert(embs.filter(col("vec_id") >= 400).count() === s1.size.toLong,
      "every genuinely new row must survive")
    // accepted survivors append into the index (no retrain)...
    Similarity.ivfAppendPartitioned(
      batch1.join(s1.toSeq.toDF("vec_id"), Seq("vec_id"), "left_semi"),
      col("vec_id"), col("embedding"), dir)
    // ...so batch 2's copy OF A BATCH-1 SURVIVOR is now caught too
    val survivorId = s1.min
    val batch2 = batch1.filter(col("vec_id") === survivorId)
      .select(lit(300001L).as("vec_id"), col("embedding"), col("label"))
    val s2 = Dedup.semanticDedupAgainstIndex(batch2, col("vec_id"),
        col("embedding"), dir, minCosine = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(s2.isEmpty,
      "a copy of an appended batch-1 survivor must be caught incrementally")
    // quantized indexes are refused with the typed error
    val qdir = Files.createTempDirectory("graft-semincr-q").toString + "/emb"
    Similarity.ivfWritePartitioned(corpus, col("vec_id"), col("embedding"), 8,
      qdir, kmeansIters = 2, quantize = true)
    val err = intercept[graft.core.BadCallException] {
      Dedup.semanticDedupAgainstIndex(batch1, col("vec_id"), col("embedding"),
        qdir, minCosine = 0.9).collect()
    }
    assert(err.getMessage.contains("quantized"))
  }

  test("ivf-pq index: full probe + full candidates equals brute force; ADC pass partition- and column-prunes") {
    val dir = Files.createTempDirectory("graft-ivfpq").toString + "/emb"
    val q = embs.filter(col("vec_id") === 0)
    val body = embs.filter(col("vec_id") =!= 0)
    val model = Similarity.pqTrain(body, col("vec_id"), col("embedding"), m = 16, ks = 16)
    Similarity.ivfPqWritePartitioned(body, col("vec_id"), col("embedding"),
      nCentroids = 4, model, dir, kmeansIters = 2)
    // degenerate full-probe + all-candidates serve ≡ exact brute force
    val n = body.count().toInt
    val brute = Similarity.bruteForceTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Similarity.ivfPqTopKPartitioned(spark, dir, q, col("embedding"),
      nProbe = 4, nCandidates = n, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === brute)
    // the index layout serves a pruned ADC pass: cluster filter reaches
    // PartitionFilters and the scan projects (id, codes) without the fp32
    // column — the partition × column pruning the 100 TB read cost rides on
    val adc = spark.read.parquet(dir)
      .filter(col("cluster").isin(0L, 1L)).select("id", "codes")
    val plan = adc.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"ADC pass must partition-prune unprobed lists:\n$plan")
    val readSchema = plan.split("ReadSchema:").last
    assert(readSchema.contains("codes") && !readSchema.contains("\"v\""),
      s"ADC pass must not read the fp32 vectors:\n$readSchema")
    // typed manifest errors
    val overProbe = intercept[graft.core.BadCallException] {
      Similarity.ivfPqTopKPartitioned(spark, dir, q, col("embedding"),
        nProbe = 99, nCandidates = 10, k = 10)
    }
    assert(overProbe.getMessage.contains("exceeds the index's 4 inverted lists"))
    import spark.implicits._
    val badDim = intercept[graft.core.BadCallException] {
      Similarity.ivfPqTopKPartitioned(spark, dir,
        Seq(Tuple1(Array(1f, 2f))).toDF("qv"), col("qv"), nProbe = 2,
        nCandidates = 10, k = 10)
    }
    assert(badDim.getMessage.contains("query vector has 2"))
  }

  test("batched pq serve: per-query results identical to the single-query path") {
    val body = embs.filter(col("vec_id") >= 3)
    val queries = embs.filter(col("vec_id") < 3)
    val model = Similarity.pqTrain(body, col("vec_id"), col("embedding"), m = 16, ks = 16)
    val encoded = Similarity.pqEncode(
      body.select(col("vec_id"), col("embedding")), col("embedding"), model)
    val batch = Similarity.pqTopKBatchOnCodes(encoded, col("vec_id"), col("codes"),
        body, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), model, 50, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    for (q <- 0L until 3L) {
      val single = Similarity.pqTopKOnCodes(encoded, col("vec_id"), col("codes"),
          body, col("vec_id"), col("embedding"),
          embs.filter(col("vec_id") === q), col("embedding"), model, 50, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(batch(q).toSeq === single, s"query $q batch/single mismatch")
    }
  }

  test("bucketized range join equals the naive interval join, without a nested loop") {
    import graft.ops.RangeJoin
    val H = 3600000000L
    val ev = graft.queries.QueryUtil.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    // overlapping 2h ranges straddling bucket boundaries
    val ranges = ev.select((expr(s"us div $H") * H - H / 2).as("s")).distinct()
      .select(col("s"), (col("s") + 2 * H).as("e2"))
    val got = RangeJoin.pointInRange(ev, col("us"), ranges, col("s"), col("e2"), H)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join must plan as an equi-join on the bucket:\n$plan")
    val naive = ev.join(ranges, col("us") >= col("s") && col("us") < col("e2"))
    assert(got.count() === naive.count())
    assert(got.select("event_id", "s").exceptAll(naive.select("event_id", "s")).isEmpty)
    assert(naive.select("event_id", "s").exceptAll(got.select("event_id", "s")).isEmpty)
  }

  test("ivf partitioned table partition-prunes at probe time, same answer as online ivf") {
    val dir = Files.createTempDirectory("graft-ivf").toString + "/emb"
    val q = embs.filter(col("vec_id") === 0)
    val body = embs.filter(col("vec_id") =!= 0)
    Similarity.ivfWritePartitioned(body, col("vec_id"), col("embedding"), 8, dir)
    val offline = Similarity.ivfTopKPartitioned(spark, dir, q, col("embedding"),
      nProbe = 3, k = 10)
    val plan = offline.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"probe must prune unprobed inverted lists at the scan:\n$plan")
    val online = Similarity.ivfTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), nCentroids = 8, nProbe = 3, k = 10)
    assert(offline.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      online.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("durable ivf index: cold-session probe loads persisted centroids, bit-equal, no exchange") {
    val dir = Files.createTempDirectory("graft-ivf-cold").toString + "/emb"
    val q = embs.filter(col("vec_id") === 0)
    val body = embs.filter(col("vec_id") =!= 0)
    // index build with TRAINED centroids (the expensive part a new session
    // must never repeat)
    Similarity.ivfWritePartitioned(body, col("vec_id"), col("embedding"), 8, dir,
      kmeansIters = 4)
    val warm = Similarity.ivfTopKPartitioned(spark, dir, q, col("embedding"),
      nProbe = 3, k = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // simulate a fresh session: the session-scoped centroid memo is gone,
    // so the probe can only answer from the PERSISTED index
    Similarity.clearCentroidCache()
    val cold = Similarity.ivfTopKPartitioned(spark, dir, q, col("embedding"),
      nProbe = 3, k = 10)
    val plan = cold.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"cold probe must partition-prune:\n$plan")
    assert(!plan.contains("Exchange"), s"cold probe must not shuffle vectors:\n$plan")
    assert(cold.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === warm,
      "cold-session probe must be bit-equal to the warm one")
    // the manifest sidecar records what the index IS and gates bad probes
    val m = Similarity.ivfReadManifest(spark, dir)
    assert(m.nonEmpty, "a fresh index must carry a manifest")
    val dim = embs.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head.getInt(0)
    assert(m.get.path("nCentroids").asInt() === 8)
    assert(m.get.path("dim").asInt() === dim)
    assert(m.get.path("kmeansIters").asInt() === 4)
    assert(m.get.path("metric").asText() === "cosine")
    val overProbe = intercept[graft.core.BadCallException] {
      Similarity.ivfTopKPartitioned(spark, dir, q, col("embedding"),
        nProbe = 99, k = 10)
    }
    assert(overProbe.getMessage.contains("exceeds the index's 8 inverted lists"))
    import spark.implicits._
    val badDim = intercept[graft.core.BadCallException] {
      Similarity.ivfTopKPartitioned(spark, dir,
        Seq(Tuple1(Array(1f, 2f))).toDF("qv"), col("qv"), nProbe = 2, k = 10)
    }
    assert(badDim.getMessage.contains(s"$dim-dim vectors; query vector has 2"))
    // pre-manifest indexes stay probe-able: delete the sidecar, same answer
    val mp = new org.apache.hadoop.fs.Path(s"$dir.manifest.json")
    mp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(mp, false)
    assert(Similarity.ivfReadManifest(spark, dir).isEmpty)
    val legacy = Similarity.ivfTopKPartitioned(spark, dir, q, col("embedding"),
      nProbe = 3, k = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(legacy === warm, "manifest-less probe must still answer identically")
  }

  test("quantized ivf index: int8 inverted lists, pruned probe, recall vs fp32 index") {
    val dir = Files.createTempDirectory("graft-ivf-q").toString + "/emb"
    val q = embs.filter(col("vec_id") === 0)
    val body = embs.filter(col("vec_id") =!= 0)
    Similarity.ivfWritePartitioned(body, col("vec_id"), col("embedding"), 8,
      dir, kmeansIters = 4, quantize = true)
    // the lists really hold codes: tinyint array + scale, no fp32 column
    val schema = spark.read.parquet(dir).schema
    assert(schema.fieldNames.contains("qvec") && schema.fieldNames.contains("qscale")
      && !schema.fieldNames.contains("v"),
      s"quantized lists must persist codes only: ${schema.simpleString}")
    assert(Similarity.ivfReadManifest(spark, dir)
      .exists(_.path("quantized").asBoolean()), "manifest must record quantization")
    val got = Similarity.ivfTopKPartitioned(spark, dir, q, col("embedding"),
      nProbe = 8, k = 10)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && !plan.contains("Exchange"),
      s"quantized probe keeps the pruned zero-shuffle shape:\n$plan")
    // full probe vs the fp32 brute truth: int8 error is far below the
    // neighbour gaps on this corpus (OpsSpec measured recall 1.0)
    val truth = Similarity.bruteForceTopK(body, col("vec_id"),
      col("embedding"), q, col("embedding"), k = 10)
    assert(Similarity.recallAtK(got, truth, 10) >= 0.9)
  }

  test("batched ivf probe equals the per-query probe for every query in the batch") {
    val body = embs.filter(col("vec_id") >= 3)
    val queries = embs.filter(col("vec_id") < 3)
    val batch = Similarity.ivfTopKBatch(body, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        nCentroids = 8, nProbe = 3, k = 10, kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(p => (-p._2, p._1)).toSeq).toMap
    for (q <- 0L until 3L) {
      val single = Similarity.ivfTopK(body, col("vec_id"), col("embedding"),
          embs.filter(col("vec_id") === q), col("embedding"),
          nCentroids = 8, nProbe = 3, k = 10, kmeansIters = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q) === single, s"query $q diverges from the per-query probe")
    }
  }

  test("multiprobe lsh: one probe equals single-bucket lsh, more probes add recall") {
    val q = embs.filter(col("vec_id") === 0)
    val body = embs.filter(col("vec_id") =!= 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val single = ids(Similarity.lshTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), bits = 4, k = 10))
    val mp1 = ids(Similarity.lshTopKMultiprobe(body, col("vec_id"), col("embedding"),
      q, col("embedding"), bits = 4, nProbe = 1, k = 10))
    assert(mp1 === single)
    val brute = Similarity.bruteForceTopK(body, col("vec_id"), col("embedding"),
      q, col("embedding"), 10).collect().map(_.getLong(0)).toSet
    def recall(r: Seq[(Long, Double)]) = r.map(_._1).count(brute).toDouble / brute.size
    val mpAll = ids(Similarity.lshTopKMultiprobe(body, col("vec_id"), col("embedding"),
      q, col("embedding"), bits = 4, nProbe = 5, k = 10))
    assert(recall(mpAll) >= recall(mp1), s"${recall(mpAll)} < ${recall(mp1)}")
  }

  test("ivf probe plan is scan→project→filter→top-k: no exchange, no join") {
    val q = embs.filter(col("vec_id") === 0)
    val body = embs.filter(col("vec_id") =!= 0)
    for (iters <- Seq(0, 3)) { // hash-sampled AND k-means centroids
      val plan = Similarity.ivfTopK(body, col("vec_id"), col("embedding"),
        q, col("embedding"), nCentroids = 8, nProbe = 3, k = 10,
        kmeansIters = iters)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"vectors must not shuffle:\n$plan")
      assert(!plan.toLowerCase.contains("join"), s"no join in the probe path:\n$plan")
    }
  }

  test("k-means centroids: recall on planted clusters ≥ hash-sample centroids") {
    import spark.implicits._
    // 8 planted clusters on orthogonal axes of a 16-dim space, fixed seed —
    // everything downstream (sampling, assignment, Lloyd) is deterministic,
    // so the recall comparison can never flake
    val rnd = new scala.util.Random(42)
    val dim = 16; val nClusters = 8; val perCluster = 50
    def point(c: Int): Array[Float] = {
      val v = Array.fill(dim)((rnd.nextDouble() * 0.1 - 0.05).toFloat)
      v(2 * c) += 1.0f
      v
    }
    val rows = for (c <- 0 until nClusters; i <- 0 until perCluster)
      yield (c.toLong * perCluster + i, point(c))
    val planted = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val qv = Seq((999L, point(3))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val exact = Similarity.bruteForceTopK(planted, col("vec_id"), col("embedding"),
      qv, col("embedding"), k = 10)
    def recall(iters: Int): Double = {
      val approx = Similarity.ivfTopK(planted, col("vec_id"), col("embedding"),
        qv, col("embedding"), nCentroids = nClusters, nProbe = 1, k = 10,
        kmeansIters = iters)
      Similarity.recallAtK(approx, exact, 10)
    }
    val hash = recall(0)
    val kmeans = recall(8)
    assert(kmeans >= hash, s"k-means recall $kmeans < hash-sample recall $hash")
    // Lloyd converges to the planted centers here, so single-probe recall
    // should be total; the hash sample has no such guarantee
    assert(kmeans === 1.0, s"k-means single-probe recall on planted clusters: $kmeans")
  }

  test("knnGraph maxBucket valve: planted fat bucket stays bounded, capped graph " +
      "is a subset of the uncapped candidate edges, slim bucket intact") {
    import spark.implicits._
    // same planted geometry as the bucketedPairsCapped spec: 64 vectors all
    // positive in the first 4 dims → ONE fat sign-bucket at bits=4 (the
    // degenerate all-positive-coordinates region that goes quadratic at
    // scale); dims 5..12 carry id-dependent signs so extraBits=8 isolates
    // every fat-bucket vector; plus a slim 3-vector bucket under the cap
    val fat = (0 until 64).map { i =>
      val v = Array.tabulate(16) { d =>
        if (d < 4) 1.0f
        else if (d < 12) (if (((i >> (d - 4)) & 1) == 1) 1.0f else -1.0f)
        else 0.1f * ((i * 7 + d) % 5 - 2)
      }
      (i.toLong, v)
    }
    val slim = (100 until 103).map(i =>
      (i.toLong, Array.tabulate(16)(d => if (d == 0) -1.0f else 1.0f)))
    val embs2 = (fat ++ slim).toDF("vec_id", "embedding")
    def edges(d: org.apache.spark.sql.DataFrame) =
      d.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = edges(Similarity.knnGraph(embs2, col("vec_id"),
      col("embedding"), bits = 4, k = 2))
    // uncapped: every fat-bucket vector has ≥ 2 candidates → 64 · 2 directed
    // edges ride on a 2016-pair quadratic self-join underneath
    assert(uncapped.count(_._1 < 100L) === 64 * 2)
    val capped = edges(Similarity.knnGraph(embs2, col("vec_id"),
      col("embedding"), bits = 4, k = 2, maxBucket = 10, extraBits = 8))
    // the 8 refinement bits are exactly the 8 id bits → every fat-bucket
    // vector lands alone (zero candidates, absent from the graph — the
    // documented LSH recall trade); the join fan-out is bounded by the cap
    // instead of the degenerate region's size
    assert(capped.forall(_._1 >= 100L), s"fat-bucket edges survived: $capped")
    // slim bucket below the cap is untouched: its full k-NN survives
    assert(capped === Set((100L, 101L), (100L, 102L), (101L, 102L),
      (101L, 100L), (102L, 100L), (102L, 101L)), s"capped=$capped")
    // subset semantics: capped edges never invent a pair the uncapped
    // candidate generation didn't already have
    assert(capped.subsetOf(uncapped))
  }

  test("semanticClusters inherits the maxBucket valve: a planted fat bucket " +
      "cannot go quadratic under the CC build; slim components survive") {
    import spark.implicits._
    // same geometry as the knnGraph valve spec: the 64-vector degenerate
    // region + a slim identical-triple bucket (cos exactly 1 within it)
    val fat = (0 until 64).map { i =>
      val v = Array.tabulate(16) { d =>
        if (d < 4) 1.0f
        else if (d < 12) (if (((i >> (d - 4)) & 1) == 1) 1.0f else -1.0f)
        else 0.1f * ((i * 7 + d) % 5 - 2)
      }
      (i.toLong, v)
    }
    val slim = (100 until 103).map(i =>
      (i.toLong, Array.tabulate(16)(d => if (d == 0) -1.0f else 1.0f)))
    val embs2 = (fat ++ slim).toDF("vec_id", "embedding")
    val capped = Similarity.semanticClusters(embs2, col("vec_id"),
        col("embedding"), bits = 4, k = 2, minCos = 0.999,
        maxBucket = 10, extraBits = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // refinement isolates every fat-bucket vector → no fat edges, no fat
    // components (the documented subset/recall trade); the slim identical
    // triple still collapses into one component rooted at its min id
    assert(capped.keySet === Set(100L, 101L, 102L), s"capped=$capped")
    assert(capped.values.toSet === Set(100L))
  }

  test("labelPropagate and marginBitextPairs inherit the maxBucket valve: " +
      "a planted fat bucket is refined away, slim-bucket results survive") {
    import spark.implicits._
    // knnGraph valve geometry: 64-vector degenerate region (one fat
    // bits=4 bucket, id-sign dims 5..12 so extraBits=8 isolates each) +
    // a slim 3-vector near-identical bucket
    val fat = (0 until 64).map { i =>
      val v = Array.tabulate(16) { d =>
        if (d < 4) 1.0f
        else if (d < 12) (if (((i >> (d - 4)) & 1) == 1) 1.0f else -1.0f)
        else 0.1f * ((i * 7 + d) % 5 - 2)
      }
      (i.toLong, v)
    }
    val slim = (100 until 103).map(i =>
      (i.toLong, Array.tabulate(16)(d => if (d == 0) -1.0f else 1.0f)))
    val nodes = (fat ++ slim)
      .map { case (id, v) => (id, v, (id % 3).toInt, id % 2 == 0) }
      .toDF("vec_id", "embedding", "label", "seed")
    val lpCapped = Similarity.labelPropagate(nodes, col("vec_id"),
        col("embedding"), col("label"), col("seed"), bits = 4, k = 2,
        maxBucket = 10, extraBits = 8)
      .collect().map(_.getLong(0)).toSet
    // every fat-bucket vector is refined into isolation → only slim-bucket
    // non-seeds (101) can still be labeled by their seed neighbors
    assert(lpCapped === Set(101L), s"capped propagation: $lpCapped")
    val lpUncapped = Similarity.labelPropagate(nodes, col("vec_id"),
        col("embedding"), col("label"), col("seed"), bits = 4, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(lpCapped.subsetOf(lpUncapped))
    val sides = nodes.withColumn("side",
      when(col("vec_id") % 2 === 0, "A").otherwise("B"))
    val mbCapped = Similarity.marginBitextPairs(sides, col("vec_id"),
        col("embedding"), col("side"), bits = 4, k = 2,
        maxBucket = 10, extraBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // slim bucket: 100/102 are side A, 101 side B → its cross pairs
    // survive; no fat-bucket pair may appear
    assert(mbCapped.nonEmpty && mbCapped.forall(p => p._1 >= 100L && p._2 >= 100L),
      s"capped margin pairs: $mbCapped")
  }

  test("labelPropagateMultiprobe maxBucket valve: a planted fat SEED bucket " +
      "is refined on both sides; slim-bucket votes are untouched") {
    import spark.implicits._
    // knnGraph valve geometry: 64-vector degenerate region whose bits=4
    // bucket (0b1111) holds 32 SEEDS — the multiprobe fan-out hazard is
    // (bits+1) probe keys × seeds-per-bucket, so the SEED census drives
    // the refinement; dims 5..12 carry id signs so extraBits=8 isolates
    // each vector. The slim bucket (0b1110, Hamming-1 from the fat one)
    // keeps 2 seeds — every fat non-seed probes INTO it and must still
    // match there after the valve fires.
    val fat = (0 until 64).map { i =>
      val v = Array.tabulate(16) { d =>
        if (d < 4) 1.0f
        else if (d < 12) (if (((i >> (d - 4)) & 1) == 1) 1.0f else -1.0f)
        else 0.1f * ((i * 7 + d) % 5 - 2)
      }
      (i.toLong, v)
    }
    val slim = (100 until 103).map(i =>
      (i.toLong, Array.tabulate(16)(d => if (d == 0) -1.0f else 1.0f)))
    val nodes = (fat ++ slim)
      .map { case (id, v) => (id, v, (id % 3).toInt, id % 2 == 0) }
      .toDF("vec_id", "embedding", "label", "seed")
    def run(cap: Long) = Similarity.labelPropagateMultiprobe(nodes,
        col("vec_id"), col("embedding"), col("label"), col("seed"),
        bits = 4, k = 2, maxBucket = cap, extraBits = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    val capped = run(10L)
    val uncapped = run(Long.MaxValue)
    // capped labeled set ⊆ uncapped (refinement only splits buckets)
    assert(capped.keySet.subsetOf(uncapped.keySet))
    // every fat non-seed is refined OUT of the fat seed bucket but still
    // reaches the slim bucket through its Hamming-1 probe: its only two
    // voters are slim seeds 100 (label 1) / 102 (label 0) → tie of 1 vote
    // each, smaller label wins, deg 2. 32 fat non-seeds + slim 101.
    assert(capped.keySet === ((1L until 64L by 2).toSet + 101L),
      s"capped ids: ${capped.keySet}")
    capped.filterKeys(_ < 100L).foreach { case (i, row) =>
      assert(row === ((0, 1L, 2L)), s"fat non-seed $i: $row")
    }
    // slim-bucket query 101 is bit-identical under the valve (its own
    // bucket is below the cap; its fat probe finds no same-extra seed)
    assert(capped(101L) === uncapped(101L))
  }

  test("knnGraphAppend threads the maxBucket valve: capped append ≡ capped " +
      "rebuild on the planted fat bucket, and ⊆ the uncapped append") {
    import spark.implicits._
    val fat = (0 until 64).map { i =>
      val v = Array.tabulate(16) { d =>
        if (d < 4) 1.0f
        else if (d < 12) (if (((i >> (d - 4)) & 1) == 1) 1.0f else -1.0f)
        else 0.1f * ((i * 7 + d) % 5 - 2)
      }
      (i.toLong, v)
    }
    val slim = (100 until 103).map(i =>
      (i.toLong, Array.tabulate(16)(d => if (d == 0) -1.0f else 1.0f)))
    // corpus = 60 fat + the slim triple; batch = the last 4 fat vectors
    // (they land in the already-fat bucket — the degenerate-region append)
    val corpus = (fat.take(60) ++ slim).toDF("vec_id", "embedding")
    val batch = fat.drop(60).toDF("vec_id", "embedding")
    val union = (fat ++ slim).toDF("vec_id", "embedding")
    def edges(d: org.apache.spark.sql.DataFrame) =
      d.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oldCapped = Similarity.knnGraph(corpus, col("vec_id"),
      col("embedding"), bits = 4, k = 2, maxBucket = 10, extraBits = 8)
    val appendCapped = edges(Similarity.knnGraphAppend(oldCapped, corpus,
      batch, col("vec_id"), col("embedding"), bits = 4, k = 2,
      maxBucket = 10, extraBits = 8))
    val rebuildCapped = edges(Similarity.knnGraph(union, col("vec_id"),
      col("embedding"), bits = 4, k = 2, maxBucket = 10, extraBits = 8))
    // the fat bucket is over the cap in BOTH the corpus build and the
    // union rebuild, so refinement agrees everywhere → bit-for-bit equal
    assert(appendCapped === rebuildCapped,
      s"capped append diverged: $appendCapped vs $rebuildCapped")
    // and the valve only ever LOSES candidates vs the uncapped append
    val oldUncapped = Similarity.knnGraph(corpus, col("vec_id"),
      col("embedding"), bits = 4, k = 2)
    val appendUncapped = edges(Similarity.knnGraphAppend(oldUncapped, corpus,
      batch, col("vec_id"), col("embedding"), bits = 4, k = 2))
    assert(appendCapped.subsetOf(appendUncapped))
    // the uncapped append DID see the fat bucket (the hazard is real)
    assert(appendUncapped.exists(_._1 < 100L))
  }

  test("annJoin: cross-table top-k ≡ per-bucket brute replay; maxBucket " +
      "valve bounds a fat bucket from EITHER side; capped ⊆ uncapped") {
    import spark.implicits._
    // left = 4 probes; right = 64-vector fat bucket (same geometry as the
    // knnGraph spec: all-positive first 4 dims, id-sign dims 5..12) + one
    // slim 3-vector bucket. At bits=4 every fat right row shares the
    // left probes' bucket.
    // probe extra-bit sign pattern (dims 4..11: − − − − − − + +) spells
    // id 192 ≥ 64, so after refinement NO fat vector shares a probe's
    // 12-bit bucket — the cap must empty the candidate set entirely
    val probes = (200 until 204).map { i =>
      val v = Array.tabulate(16)(d =>
        if (d < 4) 1.0f
        else if (d < 10) -0.01f * ((d + (i % 3)) % 3 + 1)
        else if (d < 12) 0.01f
        else 0.02f * ((i + d) % 5 - 2))
      (i.toLong, v)
    }
    val fat = (0 until 64).map { i =>
      val v = Array.tabulate(16) { d =>
        if (d < 4) 1.0f
        else if (d < 12) (if (((i >> (d - 4)) & 1) == 1) 1.0f else -1.0f)
        else 0.1f * ((i * 7 + d) % 5 - 2)
      }
      (i.toLong, v)
    }
    val slim = (100 until 103).map(i =>
      (i.toLong, Array.tabulate(16)(d => if (d == 0) -1.0f else 1.0f)))
    val left = probes.toDF("vec_id", "embedding")
    val right = (fat ++ slim).toDF("vec_id", "embedding")
    def edges(d: org.apache.spark.sql.DataFrame) =
      d.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Similarity.annJoin(left, col("vec_id"), col("embedding"),
      right, col("vec_id"), col("embedding"), bits = 4, k = 3)
    // every probe shares the fat bucket → exactly k candidates survive,
    // and the brute per-bucket replay agrees on every rank
    val got = uncapped.select("i", "j", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = {
      val l = probes.toMap; val rset = fat.toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(b.map(x => x.toDouble * x).sum))
      }
      l.flatMap { case (i, lv) =>
        rset.toSeq.map { case (j, rv) => (j, cos(lv, rv)) }
          .sortBy { case (j, c) => (-c, j) }.take(3).zipWithIndex
          .map { case ((j, _), idx) => (i, j, idx + 1) }
      }.toSet
    }
    assert(got === brute, s"got=$got")
    // capped: the 64+4 fat bucket refines; the 8 extra sign bits separate
    // the probes from every fat vector → fat candidates vanish (recall
    // trade), nothing new appears
    val capped = edges(Similarity.annJoin(left, col("vec_id"),
      col("embedding"), right, col("vec_id"), col("embedding"),
      bits = 4, k = 3, maxBucket = 10, extraBits = 8))
    assert(capped.subsetOf(edges(uncapped)))
    assert(capped.isEmpty,
      s"fat-bucket candidates survived the cap: $capped")
  }
}
