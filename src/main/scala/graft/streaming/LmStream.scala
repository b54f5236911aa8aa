package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import graft.ops.TextAnalysis

/** A document scored under a served stupid-backoff LM: slot count and
  * exact micro-nat cross-entropy (None when the doc is too short to
  * carry an order-n slot — the [[TextAnalysis.stupidBackoff]] NULL). */
final case class LmScoredDoc(id: Long, nNgrams: Long, xentMicro: Option[Long])

/** Streaming LM quality scoring — the online half of the CCNet gate
  * ([[TextAnalysis.lmFit]] prunes and packages the count tables offline;
  * this scores ARRIVING documents): CCNet's actual deployment shape is a
  * KenLM loaded in process on every worker, and this is that shape on
  * Spark — the pruned model broadcasts once (the `maxEntries` valve at
  * fit time is what makes that legal) and scoring is a PER-ROW closure,
  * bit-identical to the batch ladder ([[TextAnalysis.lmScoreTextJvm]]
  * replays [[TextAnalysis.stupidBackoff]]'s CASE, ln order and half-up
  * micro-nat quantization exactly — StreamStaticSpec pins per-doc
  * equality with the distributed form at the same minCount).
  *
  * Same design as [[NbStream]]/[[DsirStream]]: completely STATELESS —
  * no state store, Append mode, identical output under any microbatch
  * arrival pattern; each row costs its own token scan against broadcast
  * maps, no shuffle, unbounded stream lifetime. */
object LmStream {

  def scoreDocs(docs: DataFrame, id: Column, text: Column,
      m: TextAnalysis.LmModel): Dataset[LmScoredDoc] = {
    implicit val enc: Encoder[LmScoredDoc] = Encoders.product[LmScoredDoc]
    implicit val inEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val b = docs.sparkSession.sparkContext.broadcast(m)
    docs.select(id.cast("long"), text.cast("string"))
      .as[(Long, String)]
      .map { case (i, t) =>
        val (nt, xm) = TextAnalysis.lmScoreTextJvm(t, b.value)
        LmScoredDoc(i, nt, xm)
      }
  }

  /** CCNet-at-ingest admission: keep documents whose cross-entropy sits
    * AT OR BELOW `maxXentMicro` (CCNet keeps the head/middle terciles —
    * at serving time the tercile boundary is a frozen constant from the
    * last batch calibration, exactly how the production pipeline ships
    * it). Unscorable docs (no order-n slot) are REJECTED — a length
    * floor is every curation pipeline's first rule. */
  def admit(docs: DataFrame, id: Column, text: Column,
      m: TextAnalysis.LmModel, maxXentMicro: Long): Dataset[LmScoredDoc] =
    scoreDocs(docs, id, text, m)
      .filter(d => d.xentMicro.exists(_ <= maxXentMicro))
}
