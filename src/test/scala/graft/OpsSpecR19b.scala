package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 addendum specs: the mixture OPTIMIZERS — DoReMi
  * exponentiated-gradient domain weights and the data-constrained
  * repetition allocator (the ops behind q304/q305). */
class OpsSpecR19b extends AnyFunSuite {
  import SparkTestSession._

  /** Planted corpus: domain `hard` is text the quarter-slice proxy LM
    * cannot predict (every doc a distinct token stream, and none of it
    * lands in the `doc_id % 4 == 0` proxy slice — ids chosen off the
    * residue); domain `easy` is one repeated template the proxy slice
    * DOES contain, so its excess loss is ~0. */
  private def plantedDocs = {
    import spark.implicits._
    val easy = (0 until 12).map(i => (i * 4L, "easy",
      "the quick brown fox jumps over the lazy dog again and again"))
    val hard = (0 until 12).map(i => (i * 4L + 1, "hard",
      s"zq$i xv$i kj$i wp$i mn$i rt$i yu$i io$i as$i df$i gh$i jk$i"))
    (easy ++ hard).toDF("doc_id", "domain", "text")
  }

  test("doremiWeights: every weight vector sums to EXACTLY 1e6, the " +
    "smoothing floor holds, and the high-excess domain dominates") {
    val docs = plantedDocs
    val proxy = docs.filter(col("doc_id") % 4 === 0)
    val out = graft.ops.Sampling.doremiWeights(docs, col("doc_id"),
      col("text"), col("domain"), proxy, col("text"), docs, col("text"),
      iters = 10, etaPct = 100, smoothPct = 20).orderBy("domain").collect()
    assert(out.map(_.getAs[Long]("w_last_micro")).sum === 1000000L)
    assert(out.map(_.getAs[Long]("w_avg_micro")).sum === 1000000L)
    val n = out.length
    // DoReMi's smoothing guarantee: each step mixes smoothPct% uniform,
    // so no domain can be starved below c%·u (minus one re-grid unit)
    val floor = 20L * (1000000L / n) / 100L - 1
    assert(out.forall(_.getAs[Long]("w_avg_micro") >= floor))
    val byDom = out.map(r => r.getString(0) -> r).toMap
    assert(byDom("hard").getAs[Long]("lambda_micro") >
      byDom("easy").getAs[Long]("lambda_micro"),
      "the unseen-token domain must carry the larger excess loss")
    assert(byDom("hard").getAs[Long]("w_avg_micro") >
      byDom("easy").getAs[Long]("w_avg_micro"))
    assert(byDom("hard").getAs[Long]("w_last_micro") >
      byDom("easy").getAs[Long]("w_last_micro"))
  }

  test("doremiWeights: identical proxy and reference LMs -> zero excess " +
    "everywhere -> the loop is a fixed point at the uniform vector") {
    val docs = plantedDocs
    val out = graft.ops.Sampling.doremiWeights(docs, col("doc_id"),
      col("text"), col("domain"), docs, col("text"), docs, col("text"),
      iters = 10).orderBy("domain").collect()
    // n=2 divides 1e6, so uniform is exactly 500000 per domain
    assert(out.forall(_.getAs[Long]("lambda_micro") === 0L))
    assert(out.forall(_.getAs[Long]("e_micro") === 1000000L))
    assert(out.forall(_.getAs[Long]("w_last_micro") === 500000L))
    assert(out.forall(_.getAs[Long]("w_avg_micro") === 500000L))
  }

  test("doremiWeights: the maxDomains valve raises (driver-sized weight " +
    "vector contract) instead of collecting an unbounded domain column") {
    val docs = plantedDocs
    val e = intercept[IllegalArgumentException] {
      graft.ops.Sampling.doremiWeights(docs, col("doc_id"), col("text"),
        col("doc_id").cast("string"), docs, col("text"), docs, col("text"),
        maxDomains = 4)
    }
    assert(e.getMessage.contains("maxDomains"))
  }

  private def allocDocs = {
    import spark.implicits._
    // token counts per domain: a=60, b=30, c=10 (whitespace tokens)
    Seq(
      (1L, "a", Seq.fill(60)("t").mkString(" ")),
      (2L, "b", Seq.fill(30)("t").mkString(" ")),
      (3L, "c", Seq.fill(10)("t").mkString(" "))
    ).toDF("doc_id", "domain", "text")
  }

  test("repetitionAllocate: exact budget conservation, at most one " +
    "partial chunk, partial strictly inside its chunk, and epoch counts " +
    "monotone in domain size") {
    val out = graft.ops.Sampling.repetitionAllocate(allocDocs,
      size(split(col("text"), " ")), col("domain"),
      budgetPct = 150, maxEpochs = 8, decayMicro = 840000L)
      .orderBy("domain").collect()
    val total = out.map(_.getAs[Long]("tokens")).sum
    val budget = total * 150 / 100
    assert(out.map(_.getAs[Long]("alloc_tokens")).sum === budget,
      "the greedy prefix must spend the budget exactly")
    val partials = out.filter(_.getAs[Long]("partial_tokens") > 0)
    assert(partials.length <= 1, "only the boundary chunk splits")
    partials.foreach(r => assert(
      r.getAs[Long]("partial_tokens") < r.getAs[Long]("tokens")))
    val byTok = out.sortBy(-_.getAs[Long]("tokens"))
    assert(byTok.map(_.getAs[Long]("full_epochs")).toSeq ===
      byTok.map(_.getAs[Long]("full_epochs")).toSeq.sorted.reverse,
      "a larger domain's e-th epoch always outranks a smaller one's")
    out.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") ===
        r.getAs[Long]("full_epochs") * r.getAs[Long]("tokens") +
          r.getAs[Long]("partial_tokens"))
    }
  }

  test("repetitionAllocate: a budget past maxEpochs x corpus saturates " +
    "every domain at maxEpochs full epochs, zero partial, and the " +
    "effective integral matches the decay recurrence") {
    val out = graft.ops.Sampling.repetitionAllocate(allocDocs,
      size(split(col("text"), " ")), col("domain"),
      budgetPct = 100000, maxEpochs = 3, decayMicro = 500000L)
      .orderBy("domain").collect()
    val d = Iterator.iterate(1000000L)(x => x * 500000L / 1000000L)
      .take(3).toSeq // 1e6, 5e5, 2.5e5
    out.foreach { r =>
      assert(r.getAs[Long]("full_epochs") === 3L)
      assert(r.getAs[Long]("partial_tokens") === 0L)
      assert(r.getAs[Long]("effective_micro") ===
        d.map(_ * r.getAs[Long]("tokens")).sum)
    }
  }
}
