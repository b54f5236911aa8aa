package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import graft.ops.TextAnalysis

/** A document classified under a fitted NB model. */
final case class NbClassifiedDoc(id: Long, pred: String)

/** A classified document with its confidence margin (micro-nats). */
final case class NbScoredDoc(id: Long, pred: String, marginU: Option[Long])

/** Streaming Naive Bayes classification — the online half of the
  * fit-offline / classify-online split ([[TextAnalysis.nbFit]] fits on the
  * batch seed; this applies it to ARRIVING documents): the streaming
  * deployment of the CCNet/LLaMA-style fastText gate (route by language,
  * drop rejected quality classes) at ingest time.
  *
  * Same design as [[DsirStream]]: scoring is a PER-ROW closure over the
  * broadcast model ([[TextAnalysis.nbPredictTextJvm]], the bit-exact JVM
  * twin of the Column path — integer micro-nat sums are commutative, so
  * per-row evaluation cannot diverge from the distributed aggregation) —
  * completely STATELESS: no state store, Append mode, identical output for
  * any microbatch arrival pattern (StreamStaticSpec pins equality with
  * [[TextAnalysis.nbPredict]] per document). The model broadcasts once
  * (≤ nBuckets·|classes| entries, the driver-size contract); each row
  * costs its own token hashing, no shuffle, unbounded stream lifetime. */
object NbStream {

  def classifyDocs(docs: DataFrame, id: Column, text: Column,
      m: TextAnalysis.NbModel): Dataset[NbClassifiedDoc] = {
    implicit val enc: Encoder[NbClassifiedDoc] = Encoders.product[NbClassifiedDoc]
    implicit val inEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val b = docs.sparkSession.sparkContext.broadcast(m)
    docs.select(id.cast("long"), text.cast("string"))
      .as[(Long, String)]
      .flatMap { case (i, t) =>
        Option(TextAnalysis.nbPredictTextJvm(t, b.value))
          .map(NbClassifiedDoc(i, _))
      }
  }

  /** Online class-gated admission: keep documents whose predicted class is
    * in `allowed` — the streaming quality/language gate (same argmax rule
    * as the batch classifier). */
  def admit(docs: DataFrame, id: Column, text: Column,
      m: TextAnalysis.NbModel, allowed: Set[String]): Dataset[NbClassifiedDoc] =
    classifyDocs(docs, id, text, m).filter(d => allowed.contains(d.pred))

  /** [[classifyDocs]] plus the best-vs-second CONFIDENCE MARGIN in exact
    * integer micro-nats ([[TextAnalysis.nbPredictMarginTextJvm]], the
    * bit-exact per-row twin of [[TextAnalysis.nbPredictWithMargin]]) —
    * still stateless/Append; `marginU` is None for single-label models. */
  def classifyDocsWithMargin(docs: DataFrame, id: Column, text: Column,
      m: TextAnalysis.NbModel): Dataset[NbScoredDoc] = {
    implicit val enc: Encoder[NbScoredDoc] = Encoders.product[NbScoredDoc]
    implicit val inEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val b = docs.sparkSession.sparkContext.broadcast(m)
    docs.select(id.cast("long"), text.cast("string"))
      .as[(Long, String)]
      .flatMap { case (i, t) =>
        Option(TextAnalysis.nbPredictMarginTextJvm(t, b.value))
          .map { case (p, mu) => NbScoredDoc(i, p, mu) }
      }
  }

  /** CCNet-at-ingest admission: class allowed AND margin ≥ `minMarginU`
    * — the streaming form of the q254 confidence gate (a shaky label is
    * as bad as a wrong one at ingest time; route those to review
    * instead). */
  def admitConfident(docs: DataFrame, id: Column, text: Column,
      m: TextAnalysis.NbModel, allowed: Set[String],
      minMarginU: Long): Dataset[NbScoredDoc] =
    classifyDocsWithMargin(docs, id, text, m)
      .filter(d => allowed.contains(d.pred) && d.marginU.exists(_ >= minMarginU))
}
