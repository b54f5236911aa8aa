package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Assembly, Chunking, Similarity => Sim}
import graft.streaming.PreferenceStream

/** Round-14 operator specs: the semantic-coherent pack order (greedy k-NN
  * walk), fixed-centroid topic assignment, and the best-of-n argmax. */
class OpsSpecR14 extends AnyFunSuite {
  import SparkTestSession._

  private def walkOf(docs: Seq[(String, Long)],
      edges: Seq[(String, Long, Long, Int)]): Seq[(String, Long, Long)] = {
    import spark.implicits._
    val d = docs.toDF("source", "doc_id")
    val e = edges.toDF("g", "i", "j", "rk")
    Assembly.semanticWalk(d, col("source"), col("doc_id"), e)
      .orderBy("g", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("semanticWalk: starts at the min id, follows neighbor RANK order, " +
    "and jumps to the min unvisited id when the chain dies") {
    // 1 → (rk1: 3) → 3 → (rk1: 2 visited? no) …; doc 9 has no edges at all
    val got = walkOf(
      Seq(("s", 1L), ("s", 2L), ("s", 3L), ("s", 9L)),
      Seq(("s", 1L, 3L, 1), ("s", 1L, 2L, 2),  // 1 prefers 3 (better rank)
        ("s", 3L, 2L, 1)))                      // 3 chains to 2; 2/9 dead-end
    assert(got === Seq(("s", 1L, 1L), ("s", 2L, 3L), ("s", 3L, 2L),
      ("s", 4L, 9L)))                           // 9 reached by the jump only
  }

  test("semanticWalk: a visited neighbor is skipped in favor of the " +
    "next-ranked one; edges to docs outside the group are ignored") {
    val got = walkOf(
      Seq(("s", 1L), ("s", 2L), ("s", 3L)),
      Seq(("s", 2L, 1L, 1),   // back-edge to the visited start: skipped
        ("s", 2L, 99L, 2),    // dangling endpoint: ignored
        ("s", 2L, 3L, 3),
        ("s", 1L, 2L, 1)))
    assert(got === Seq(("s", 1L, 1L), ("s", 2L, 2L), ("s", 3L, 3L)))
  }

  test("semanticWalk: groups walk independently and every doc appears " +
    "exactly once per group") {
    val got = walkOf(
      Seq(("a", 5L), ("a", 6L), ("b", 5L), ("b", 7L), ("b", 6L)),
      Seq(("b", 5L, 7L, 1)))
    assert(got === Seq(("a", 1L, 5L), ("a", 2L, 6L),
      ("b", 1L, 5L), ("b", 2L, 7L), ("b", 3L, 6L)))
  }

  test("semanticWalk + packOrdered: related docs land in the same bin " +
    "where id-order packing splits them") {
    import spark.implicits._
    // two 2-doc semantic clusters interleaved by id: {1, 3} and {2, 4};
    // each doc is one 4-token chunk, ctx=8 → a bin holds exactly 2 docs
    val docs = Seq(("s", 1L), ("s", 2L), ("s", 3L), ("s", 4L))
      .toDF("source", "doc_id")
    val edges = Seq(("s", 1L, 3L, 1), ("s", 3L, 1L, 1),
      ("s", 2L, 4L, 1), ("s", 4L, 2L, 1)).toDF("g", "i", "j", "rk")
    val order = Assembly.semanticWalk(docs, col("source"), col("doc_id"),
      edges)
    val chunks = Seq((1L, 0, "a b c d", 4), (2L, 0, "e f g h", 4),
      (3L, 0, "i j k l", 4), (4L, 0, "m n o p", 4))
      .toDF("doc", "chunk_idx", "chunk", "n_tok")
    val packed = Chunking.packOrdered(chunks.join(order, "doc"),
        col("g"), ctx = 8, Seq(col("pos"), col("chunk_idx")))
      .select(col("doc"), col("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed(1L) === packed(3L), "cluster {1,3} must share a bin")
    assert(packed(2L) === packed(4L), "cluster {2,4} must share a bin")
    assert(packed(1L) !== packed(2L))
    // the id-order baseline (plain pack) splits both clusters
    val idPacked = Chunking.pack(chunks.withColumn("g", lit("s")),
        col("g"), ctx = 8)
      .select(col("doc"), col("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idPacked(1L) !== idPacked(3L),
      "baseline must split the cluster or the semantic pin is vacuous")
  }

  test("semanticWalk plan: exactly the cogroup's two hash exchanges — " +
    "the walk never shuffles more than the docs + bounded edge list") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (s"s${i % 3}", i))
      .toDF("source", "doc_id")
    val edges = (0L until 49L).map(i => (s"s${i % 3}", i, i + 1, 1))
      .toDF("g", "i", "j", "rk")
    val p = Assembly.semanticWalk(docs, col("source"), col("doc_id"),
      edges).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 2, s"expected the two cogroup exchanges, got:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"no unbounded join may hide in the walk:\n$p")
  }

  test("assignCentroids: exact-centroid vectors map to their own topic; " +
    "an equidistant vector breaks the tie to the LOWEST centroid id") {
    import spark.implicits._
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
    val vecs = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 2.0f)),
      (12L, Array(1.0f, 1.0f)))  // equidistant: cos = 1/√2 to both
      .toDF("vec_id", "embedding")
    val got = Sim.assignCentroids(vecs, col("vec_id"), col("embedding"),
        cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 0L, 11L -> 1L, 12L -> 0L))
  }

  test("assignCentroids is one shuffle-free projection over centroid " +
    "literals") {
    import spark.implicits._
    val cents = (0 until 4).map(t =>
      (t.toLong, Array.tabulate(8)(i => if (i / 2 == t) 1.0f else -0.25f)))
    val vecs = Seq((1L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val p = Sim.assignCentroids(vecs, col("vec_id"), col("embedding"),
      cents).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"assignment must not shuffle:\n$p")
  }

  test("expandCopies: one row per copy, zero-copy rows vanish (the " +
    "sequence(1,0) step trap), and the valve FAILS loudly, not silently") {
    import spark.implicits._
    import graft.ops.Sampling
    val df = Seq((1L, 3L), (2L, 0L), (3L, 1L)).toDF("id", "nc")
    val got = Sampling.expandCopies(df, col("nc"))
      .select("id", "copy").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((1L, 1L), (1L, 2L), (1L, 3L), (3L, 1L)))
    val boom = intercept[Exception] {
      Sampling.expandCopies(df, col("nc"), maxCopies = 2).collect()
    }
    assert(boom.getMessage.contains("valve"), s"got: ${boom.getMessage}")
  }

  test("epochPlan: the data-card integers round-trip the atomic publish " +
    "barrier and agree with what epochExpansion actually runs") {
    import spark.implicits._
    import graft.ops.Sampling
    val docs = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 15L), ("b", 5L, 25L), ("c", 6L, 10L))
      .toDF("g", "id", "ntok")
    val w = Seq("a" -> 3L, "b" -> 1L)
    val plan = Sampling.epochPlan(docs, col("ntok"), col("g"), w, 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // hand-computed: a: T=60, w=3 → tgt=75, fe=1, rem=15; b: T=40, w=1 →
    // tgt=25, fe=0, rem=25; c: unweighted → all zero
    assert(plan === Map(
      "a" -> ((60L, 3L, 75L, 1L, 15L)),
      "b" -> ((40L, 1L, 25L, 0L, 25L)),
      "c" -> ((10L, 0L, 0L, 0L, 0L))))
    // the plan's full_epochs are the expansion's, by shared construction
    val fe = Sampling.epochExpansion(docs, col("id"), col("ntok"), col("g"),
        w, 100L)
      .select("g", "full_epochs").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fe === plan.view.mapValues(_._4).toMap)
    // publish → reload through the manifest barrier, bit-identical
    val dir = java.nio.file.Files
      .createTempDirectory("graft-epochplan").toString
    Sampling.epochPlanSave(
      Sampling.epochPlan(docs, col("ntok"), col("g"), w, 100L), dir)
    val reloaded = Sampling.epochPlanLoad(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(reloaded === plan)
  }

  test("bestOfN: argmax by reward, tie to the lowest src; margin is " +
    "best-minus-second-best and 0 for a single candidate") {
    import spark.implicits._
    val cands = Seq(
      // prompt 0: rewards 3, 2 → margin 1, chosen src 10
      (0L, 10L, "a b c", "p0"), (0L, 11L, "a b", "p0"),
      // prompt 1: reward TIE at 2 → min src 20 wins, margin 0
      (1L, 21L, "x y", "p1"), (1L, 20L, "u v", "p1"),
      // prompt 2: single candidate → margin 0
      (2L, 30L, "only one here", "p2"))
      .toDF("prompt_id", "src", "resp", "prompt")
    val got = PreferenceStream.bestOfN(cands).orderBy("prompt_id")
      .select("prompt_id", "n_candidates", "chosen_src", "reward_chosen",
        "reward_margin")
      .collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq(0L, 2L, 10L, 3L, 1L),
      Seq(1L, 2L, 20L, 2L, 0L),
      Seq(2L, 1L, 30L, 3L, 0L)))
  }

  test("epochExpansion: full epochs + hash-prefix partial epoch; a " +
    "weightless group gets 0 copies; the take never overshoots target") {
    import spark.implicits._
    import graft.ops.Sampling
    // group a: T=60; w=3, budget 100, Σw=4 → tgt=75, fe=1, rem=15
    // group b: T=40; w=1 → tgt=25, fe=0, rem=25
    // group c: unweighted → 0 copies
    val docs = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 15L), ("b", 5L, 25L),
      ("c", 6L, 10L))
      .toDF("g", "id", "ntok")
    val ex = Sampling.epochExpansion(docs, col("id"), col("ntok"), col("g"),
        Seq("a" -> 3L, "b" -> 1L), totalBudget = 100L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("full_epochs"), r.getAs[Boolean]("in_partial"),
          r.getAs[Long]("n_copies"))).toMap
    assert(ex(6L) === ((0L, false, 0L)), "weightless group: 0 copies")
    assert(Seq(1L, 2L, 3L).forall(ex(_)._1 === 1L), "a: one full epoch")
    assert(Seq(4L, 5L).forall(ex(_)._1 === 0L), "b: no full epoch")
    // the partial take must replay budgetPerGroup's exact prefix rule
    def prefix(ids: Seq[Long], budget: Long): Set[Long] = {
      val sub = docs.filter(col("id").isin(ids: _*))
      Sampling.budgetPerGroup(sub, col("id"), col("ntok"), col("g"), budget)
        .collect().map(_.getAs[Long]("id")).toSet
    }
    assert(ex.filter(_._2._2).keySet ===
      prefix(Seq(1L, 2L, 3L), 15L) ++ prefix(Seq(4L, 5L), 25L))
    // and the expanded token mass never overshoots the integer target
    val aTok = Seq(1L -> 10L, 2L -> 20L, 3L -> 30L)
      .map { case (i, t) => ex(i)._3 * t }.sum
    val bTok = Seq(4L -> 15L, 5L -> 25L)
      .map { case (i, t) => ex(i)._3 * t }.sum
    assert(aTok <= 75L && aTok > 75L - 60L, s"a expanded $aTok vs target 75")
    assert(bTok <= 25L, s"b expanded $bTok vs target 25")
  }

  test("bestOfN: duplicate-token responses score by DISTINCT vocabulary " +
    "(the shared reward projection), matching gate()'s scorer") {
    import spark.implicits._
    val cands = Seq(
      (0L, 1L, "w w w w w w", "p"),      // 1 distinct
      (0L, 2L, "a b a b", "p"))          // 2 distinct
      .toDF("prompt_id", "src", "resp", "prompt")
    val r = PreferenceStream.bestOfN(cands).collect()(0)
    assert(r.getAs[Long]("chosen_src") === 2L)
    assert(r.getAs[Long]("reward_chosen") === 2L)
    assert(r.getAs[Long]("reward_margin") === 1L)
  }
}
