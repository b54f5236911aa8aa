package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import graft.ops.Sampling

/** A document scored against a fitted DSIR table: `weight_u` in integer
  * micro-nats, `n_grams` = grams that hit a fitted bucket. */
final case class DsirScoredDoc(id: Long, grp: String, n_grams: Long,
    dsir_weight_u: Long)

/** Streaming DSIR scoring — the ONLINE half of the fit-offline /
  * score-online split: [[graft.ops.Sampling.dsirScoreTable]] fits the
  * ≤ nBuckets-entry model on the batch corpus; this scorer applies it to
  * ARRIVING documents. Unlike the batch op's explode + broadcast-join +
  * per-doc aggregation, scoring here is a PER-ROW closure over the
  * broadcast table ([[Sampling.dsirScoreTextJvm]], the bit-exact JVM twin
  * of the Column-side arithmetic) — completely STATELESS: no aggregation
  * state store, Append output mode, identical results for any microbatch
  * arrival pattern (spec-pinned equal to [[Sampling.dsirWeights]] per
  * document).
  *
  * Scale shape: the model broadcasts once (MBs at the paper's 2^16
  * buckets); each row costs its own gram hashing and nothing else — no
  * shuffle, no state, unbounded stream lifetime. The admission variant is
  * a pure filter on the scored output. */
object DsirStream {

  def scoreDocs(docs: DataFrame, id: Column, text: Column, grp: Column,
      scores: Map[Long, Long], nBuckets: Int,
      seed: Int = 7): Dataset[DsirScoredDoc] = {
    implicit val enc: Encoder[DsirScoredDoc] = Encoders.product[DsirScoredDoc]
    implicit val inEnc: Encoder[(Long, String, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING)
    val b = docs.sparkSession.sparkContext.broadcast(scores)
    docs.select(id.cast("long"), grp.cast("string"), text.cast("string"))
      .as[(Long, String, String)]
      .map { case (i, g, t) =>
        val (n, w) = Sampling.dsirScoreTextJvm(t, b.value, nBuckets, seed)
        DsirScoredDoc(i, g, n, w)
      }
  }

  /** Online DSIR admission: keep documents at least `minWeightU`
    * micro-nats target-like — the streaming twin of `curate()`'s DSIR
    * stage (same `>=` rule). */
  def admit(docs: DataFrame, id: Column, text: Column, grp: Column,
      scores: Map[Long, Long], nBuckets: Int, minWeightU: Long,
      seed: Int = 7): Dataset[DsirScoredDoc] =
    scoreDocs(docs, id, text, grp, scores, nBuckets, seed)
      .filter(_.dsir_weight_u >= minWeightU)
}
