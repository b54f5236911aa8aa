package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Property-style tests (seeded random sampling — the offline cache has no
  * scalatest↔scalacheck bridge): the filter-triplet translator agrees with
  * an in-memory reference predicate on arbitrary terms; concat∘re-aggregate
  * ≡ direct groupBy for arbitrary shard counts. */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val rows: Seq[(Double, String)] = {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_quantity", "l_returnflag").limit(500).collect()
    li.map(r => (r.getDouble(0), r.getString(1))).toSeq
  }
  private lazy val df = {
    import spark.implicits._
    rows.toDF("qty", "flag").cache()
  }

  private val cmpOps = IndexedSeq("==", "!=", ">", ">=", "<", "<=")

  private def eval(op: String, v: Double, x: Double): Boolean = op match {
    case "==" => x == v
    case "!=" => x != v
    case ">"  => x > v
    case ">=" => x >= v
    case "<"  => x < v
    case "<=" => x <= v
  }

  test("filter translator agrees with in-memory predicate on 40 random term lists") {
    val rnd = new scala.util.Random(42)
    (1 to 40).foreach { _ =>
      val terms = Seq.fill(1 + rnd.nextInt(3))(
        FilterTerm("qty", cmpOps(rnd.nextInt(cmpOps.size)), rnd.nextInt(61).toDouble))
      val got = df.filter(Translator.filterColumn(terms).get).count()
      val want = rows.count { case (q, _) =>
        terms.forall(t => eval(t.op, t.value.asInstanceOf[Double], q))
      }
      assert(got === want.toLong, s"terms=$terms")
    }
  }

  test("in / not in translate to exact set membership on random sets") {
    val rnd = new scala.util.Random(7)
    val universe = IndexedSeq("A", "N", "R", "X")
    (1 to 20).foreach { _ =>
      val vs = Seq.fill(1 + rnd.nextInt(4))(universe(rnd.nextInt(universe.size))).distinct
      val in = df.filter(Translator.filterColumn(
        Seq(FilterTerm("flag", "in", vs))).get).count()
      val notIn = df.filter(Translator.filterColumn(
        Seq(FilterTerm("flag", "not in", vs))).get).count()
      val want = rows.count { case (_, f) => vs.contains(f) }
      assert(in === want.toLong, s"vs=$vs")
      assert(notIn === (rows.size - want).toLong, s"vs=$vs")
    }
  }

  test("concat-combine re-aggregates to direct groupBy for shard counts 1..12") {
    val direct = df.groupBy("flag")
      .agg(sum("qty").as("s"), count(lit(1)).as("c"))
      .orderBy("flag").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    (1 to 12).foreach { nShards =>
      val concat = GroupByEngine.groupbyDfSharded(df,
        pmod(col("qty").cast("long"), lit(nShards)),
        Seq("flag"), Seq(AggSpec("qty", "sum", "s"), AggSpec("qty", "count", "c")))
      val remerged = concat.groupBy("flag")
        .agg(sum("s").as("s"), sum("c").cast("long").as("c"))
        .orderBy("flag").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      assert(remerged.toSeq === direct.toSeq, s"nShards=$nShards")
    }
  }

  test("scrub is idempotent on 200 random PII-seeded strings (safe re-runs)") {
    import spark.implicits._
    // a curation pass that changes data when re-applied corrupts resumable
    // pipelines — scrub∘scrub must equal scrub on arbitrary input
    val rnd = new scala.util.Random(1234)
    val frags = IndexedSeq("Hello", "WORLD", "a@b.io", "x.y+z@Mail.CO.uk",
      "555-123-4567", "555.123.4567", "12-34-5678", "@nolocal.io",
      "trailing@dot.", "  ", "\t", "\n", "", "<email>", "<phone>",
      "a@b.io@c.de", "123", "...", "über", "ønsker")
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(8)).map(_ => frags(rnd.nextInt(frags.size)))
        .mkString(" ")
    }
    val once = texts.toDF("t")
      .select(graft.ops.TextAnalysis.scrub(col("t")).as("s1"))
      .select(col("s1"), graft.ops.TextAnalysis.scrub(col("s1")).as("s2"))
      .filter(not(col("s1") <=> col("s2")))
    assert(once.isEmpty,
      s"scrub not idempotent on: ${once.head(3).mkString("; ")}")
  }

  test("sampleKPerGroup: exactly min(k,|group|) rows, identical under repartitioning") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame, k: Int) =
      graft.ops.Sampling.sampleKPerGroup(df, col("doc_id"), col("lang"), k)
        .select("lang", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    for (k <- Seq(1, 3, 7)) {
      val a = run(base, k)
      val b = run(base.repartition(13, col("doc_id")), k)
      assert(a === b, s"membership must not depend on layout (k=$k)")
      val sizes = a.groupBy(_._1).view.mapValues(_.size)
      val groupSizes = base.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      sizes.foreach { case (g, n) =>
        assert(n === math.min(k.toLong, groupSizes(g)), s"group $g at k=$k")
      }
    }
  }

  test("weightedSampleKPerGroup: layout-independent, weight-biased, clamp honored") {
    import spark.implicits._
    val rows = (0 until 120).map(i =>
      (s"g${i % 3}", i.toLong, 1 + (i % 7)))
    val df = rows.toDF("g", "k", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.weightedSampleKPerGroup(d, col("k"), col("w"),
          col("g"), k = 4)
        .select("g", "k").collect().map(r => (r.getString(0), r.getLong(1)))
        .sorted.toSeq
    // membership must not depend on partition layout
    val a = run(df.repartition(1))
    val b = run(df.repartition(13, col("k")))
    val c = run(df.orderBy(desc("k")).repartition(5, col("g")))
    assert(a === b && b === c)
    // the weighting actually biases: one key with weight 60 vs 9 keys with
    // weight 1 → P(heavy wins a k=1 draw) = 60/69 ≈ 0.87 per seed; over 40
    // seeds the heavy key must win clearly more than half
    val skew = ((0L until 9L).map(i => ("g", i, 1)) :+ (("g", 9L, 60)))
      .toDF("g", "k", "w")
    val wins = (0 until 40).count { seed =>
      graft.ops.Sampling.weightedSampleKPerGroup(skew, col("k"), col("w"),
          col("g"), k = 1, seed = seed)
        .head.getLong(1) == 9L
    }
    assert(wins > 20, s"heavy key won only $wins/40 draws")
    // weights ≤ 0 clamp to 1 (still sampleable), huge weights clamp to
    // maxWeight — both are part of the cross-engine spec, not guards
    val clamped = Seq(("g", 1L, -5), ("g", 2L, 0), ("g", 3L, 1000000)).toDF("g", "k", "w")
    assert(graft.ops.Sampling.weightedSampleKPerGroup(clamped, col("k"),
      col("w"), col("g"), k = 3).count() === 3)
  }

  test("budgetPerGroup: budget honored per group, nested prefixes, layout-independent") {
    import spark.implicits._
    val rows = (0 until 150).map(i => (s"g${i % 3}", i.toLong, 5L + i % 40))
    val df = rows.toDF("g", "k", "cost")
    def keep(budget: Long, d: org.apache.spark.sql.DataFrame = df) =
      graft.ops.Sampling.budgetPerGroup(d, col("k"), col("cost"), col("g"), budget)
        .select("g", "k", "cost").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val small = keep(200); val big = keep(800)
    // every group's kept cost stays within budget
    small.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.toSeq.map(_._3).sum <= 200, s"group $g exceeds budget") }
    // a smaller budget keeps a PREFIX of the larger budget's selection —
    // the hash order is budget-independent, so mixtures nest
    assert(small.subsetOf(big), "budget prefixes must nest")
    // layout independence
    assert(keep(200, df.repartition(11, col("cost"))) === small)
    assert(keep(200, df.orderBy(desc("k")).repartition(3, col("g"))) === small)
    // a budget below every row cost keeps nothing; a huge one keeps all
    assert(keep(4).isEmpty)
    assert(keep(1000000).size === 150)
  }

  test("budgetPerGroup prefilter is byte-identical to the one-pass window, " +
    "including the under-coverage rescue and the mixture") {
    import spark.implicits._
    import graft.ops.Sampling
    import graft.functions.PortableHash
    def collected(d: org.apache.spark.sql.DataFrame) =
      d.select("g", "k", "cost").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // ordinary mixed-cost corpus: prefilter path (cutoff < full range)
    val rows = (0 until 400).map(i => (s"g${i % 3}", i.toLong, 5L + i % 40))
    val df = rows.toDF("g", "k", "cost")
    for (budget <- Seq(40L, 200L, 800L, 1000000L)) {
      val fast = collected(Sampling.budgetPerGroup(df, col("k"), col("cost"), col("g"), budget))
      val slow = collected(Sampling.budgetPerGroupOnePass(df, col("k"), col("cost"), col("g"), budget))
      assert(fast === slow, s"budget=$budget")
    }
    // adversarial under-coverage: cost mass concentrated LATE in hash
    // order, so the budget/total cutoff estimate undershoots and the
    // rescue must fall back to the full group
    val keys = (0L until 100L).sortBy(k => (PortableHash.Jvm.md5Long60(k.toString, 11), k.toString))
    val adv = keys.zipWithIndex.map { case (k, i) =>
      ("g0", k, if (i < 90) 1L else 1000L) }.toDF("g", "k", "cost")
    val advBudget = 500L
    val fastAdv = collected(Sampling.budgetPerGroup(adv, col("k"), col("cost"), col("g"), advBudget))
    val slowAdv = collected(Sampling.budgetPerGroupOnePass(adv, col("k"), col("cost"), col("g"), advBudget))
    assert(fastAdv === slowAdv && fastAdv.size === 90,
      s"rescue must recover the cheap 90-row prefix: got ${fastAdv.size}")
    // the mixture rides the same engine: spot equality vs a hand-built
    // one-pass replay of its budget allocation
    val mix = (0L until 200L).map(i => ("A", i, 50L)) ++
      (1000L until 1002L).map(i => ("B", i, 50L))
    val mixDf = mix.toDF("g", "k", "cost")
    val gotMix = collected(Sampling.sqrtTemperatureMixture(mixDf, col("k"),
      col("cost"), col("g"), totalBudget = 1100L))
    val wantMix = {
      // replay: weights isqrt(10000)=100, isqrt(100)=10 → budgets 1000/100
      collected(Sampling.budgetPerGroupOnePass(mixDf.filter(col("g") === "A"),
        col("k"), col("cost"), col("g"), 1000L)) ++
      collected(Sampling.budgetPerGroupOnePass(mixDf.filter(col("g") === "B"),
        col("k"), col("cost"), col("g"), 100L))
    }
    assert(gotMix === wantMix)
  }

  test("sampleKPerGroup: duplicate keys with differing payloads still pick " +
    "layout-independent survivors (full-row tie-break)") {
    import spark.implicits._
    // every key appears twice with a DIFFERENT payload: (hash, key) alone
    // is not a total order here, so without the full-row tie-break the
    // surviving payload would depend on partition layout
    val dup = (0 until 40).flatMap(i =>
        Seq((s"g${i % 4}", i.toLong, s"payload-a-$i"), (s"g${i % 4}", i.toLong, s"payload-b-$i")))
      .toDF("g", "k", "payload")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.sampleKPerGroup(df, col("k"), col("g"), 3)
        .select("g", "k", "payload").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val a = run(dup.repartition(1))
    val b = run(dup.repartition(17, col("payload")))
    val c = run(dup.orderBy(desc("payload")).repartition(5, col("k")))
    assert(a === b && b === c,
      "survivor payload must not depend on partition layout")
  }

  test("trainingShards: random nShards — full cover, dense positions, " +
      "shard derived from the id alone") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ids = (0L until 300L).toDF("id")
    (1 to 6).foreach { _ =>
      val n = 1 + rnd.nextInt(16)
      val got = graft.ops.Sampling.trainingShards(ids, col("id"), n, seed = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      assert(got.length === 300)
      assert(got.forall(x => x._2 >= 0 && x._2 < n))
      got.groupBy(_._2).foreach { case (_, rs) =>
        assert(rs.map(_._3).sorted.toSeq === (0 until rs.length))
      }
      // subset stability: dropping rows never changes survivors' shards
      val half = graft.ops.Sampling.trainingShards(
          ids.filter(col("id") < 150), col("id"), n, seed = 3)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val full = got.map(x => x._1 -> x._2).toMap
      half.foreach { case (id, sh) => assert(full(id) === sh) }
    }
  }

  test("count-min never undercounts on random multisets, any (depth, width)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val occ = Seq.fill(400)(s"k${rnd.nextInt(60)}").toDF("x")
      val truth = occ.groupBy("x").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val d = 1 + rnd.nextInt(5)
      val wd = 1 + rnd.nextInt(64)
      val sk = graft.ops.Profiling.cmsBuild(occ, col("x"), d, wd)
      val est = graft.ops.Profiling.cmsEstimate(sk,
          truth.keys.toSeq.toDF("x"), col("x"), d, wd)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (k, t) =>
        assert(est(k) >= t, s"undercount at $k (d=$d w=$wd)")
        assert(est(k) <= 400L, "estimate cannot exceed stream length")
      }
    }
  }

  test("spanCorruptionStats invariants hold on random texts and parameters") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (0 until 60).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(s"t${rnd.nextInt(9)}")
        .mkString(" "))
    }.toDF("id", "text")
    (1 to 4).foreach { _ =>
      val len = 1 + rnd.nextInt(5)
      val rate = 0.05 + rnd.nextDouble() * 0.9
      graft.ops.Chunking.spanCorruptionStats(docs, col("id"), col("text"),
          spanLen = len, startRate = rate)
        .collect().foreach { r =>
          val (n, spans, masked) = (r.getInt(1), r.getInt(2), r.getInt(3))
          val (pos, inLen, tgtLen) = (r.getLong(4), r.getInt(5), r.getInt(6))
          assert(spans >= 0 && masked >= spans && masked <= n)
          assert(inLen === n - masked + spans)
          assert(tgtLen === masked + spans)
          assert(pos >= masked.toLong && pos <= n.toLong * (n + 1) / 2)
        }
    }
  }
}
