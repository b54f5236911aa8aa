package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained unigram-LM (SentencePiece-style) tokenizer vocabulary:
  * `pieces(i)` scores `scoresMicro(i)` MICRO-NATS (log-prob × 10⁶ as
  * BIGINT — the repo's integer-grid discipline, so the model itself is
  * exact and every downstream Viterbi comparison is integer arithmetic).
  * Driver-sized by contract (real unigram vocabs are 8k–64k pieces ≈ a
  * few MB — the [[BpeModel]] budget class) and shipped to executors
  * inside the expression via `addReferenceObj`.
  *
  * `unkScoreMicro` prices a single character with no vocab entry (the
  * SentencePiece `<unk>` escape hatch) — it guarantees every word
  * segments. Piece lookup tables rebuild lazily per deserialized copy. */
final class UnigramModel(val pieces: Array[String],
    val scoresMicro: Array[Long], val unkScoreMicro: Long)
    extends Serializable {
  locally {
    require(pieces.nonEmpty, "unigram vocab must be non-empty")
    require(pieces.length == scoresMicro.length,
      s"${pieces.length} pieces vs ${scoresMicro.length} scores")
    val seen = new java.util.HashSet[String]()
    pieces.foreach { p =>
      require(p != null && p.nonEmpty, "unigram piece must be non-empty")
      require(p.length <= UnigramApply.MaxPieceLen,
        s"piece longer than ${UnigramApply.MaxPieceLen} chars: '$p'")
      require(seen.add(p), s"duplicate unigram piece: '$p'")
    }
  }

  @transient lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Long.valueOf(scoresMicro(i)))
      i += 1
    }
    m
  }

  @transient lazy val maxLen: Int = pieces.map(_.length).max

  override def toString: String = s"UnigramModel(${pieces.length} pieces)"
}

/** Viterbi SEGMENTATION under a trained [[UnigramModel]] as one native
  * per-row pass: pre-tokenize with [[BpeApply.TokenPatternString]] (the
  * SAME pre-tokenizer as the BPE path, so the two tokenizers meter the
  * same word stream and their budgets compare apples-to-apples), then per
  * word take the maximum-score segmentation
  * `argmax Σ score(piece)` by dynamic programming over char positions.
  *
  * Ties are REACHABLE here (scores are integer micro-nats, and a planted
  * model can give two segmentations the same sum), so the tie-break is
  * part of the contract: among equal-score segmentations the one whose
  * US-separated piece string (`piece₁ + US + piece₂ …`) is LEXICOGRAPHICALLY
  * GREATEST wins. Because every candidate at a DP position spells the
  * same word prefix, candidate strings first differ at a char-vs-US
  * position, which (a) makes the comparison decide before either string
  * ends, so the greedy per-position DP is exact, and (b) means ties
  * prefer the LONGER piece at the first divergence (US 0x1F sorts below
  * every word character). Byte-wise (DuckDB memcmp) and Java char-wise
  * comparison agree on ASCII — the oracle's replay domain.
  *
  * Scale shape: zero shuffle — a projection inside whole-stage codegen;
  * per-word cost O(len × maxPieceLen) integer adds. */
case class UnigramApply(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_apply expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    UnigramApply.encode(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramApply.encode($c, $modelRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramApply =
    copy(child = newChild)

  override def prettyName: String = "unigram_apply"
}

object UnigramApply {

  /** Hard cap on piece length — bounds the DP inner loop and the oracle's
    * unrolled candidate join. */
  val MaxPieceLen = 8

  /** The tie-break separator (US, 0x1F): sorts below every word character
    * in both UTF-16 code-unit and UTF-8 byte order. */
  val Sep = '\u001F'

  private val TokenPattern =
    java.util.regex.Pattern.compile(BpeApply.TokenPatternString)

  def encode(text: UTF8String, model: UnigramModel): GenericArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String]()
    val m = TokenPattern.matcher(s)
    while (m.find()) {
      val seg = segmentWord(m.group(), model)
      var i = 0
      while (i < seg.length) {
        out.add(UTF8String.fromString(seg(i)))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** The Viterbi DP on one pre-token (see [[UnigramApply]] for the exact
    * argmax + tie-break contract). */
  def segmentWord(word: String, model: UnigramModel): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val L = math.min(model.maxLen, n)
    val best = new Array[Long](n + 1)
    val seg = new Array[String](n + 1)
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    seg(0) = ""
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - math.max(L, 1))
      while (i < j) {
        if (best(i) != Long.MinValue) {
          val piece = word.substring(i, j)
          val hit = model.table.get(piece)
          val sm: java.lang.Long =
            if (hit != null) hit
            else if (j - i == 1) java.lang.Long.valueOf(model.unkScoreMicro)
            else null
          if (sm != null) {
            val cand = best(i) + sm.longValue()
            if (cand > best(j)) {
              best(j) = cand
              seg(j) = if (i == 0) piece else seg(i) + Sep + piece
            } else if (cand == best(j)) {
              val candSeg = if (i == 0) piece else seg(i) + Sep + piece
              if (candSeg.compareTo(seg(j)) > 0) seg(j) = candSeg
            }
          }
        }
        i += 1
      }
      j += 1
    }
    // best(n) is always reachable (the unk fallback prices every char)
    seg(n).split(Sep)
  }

  /** Per-word E-STEP of unigram-LM EM training (Kudo 2018 §3): expected
    * piece counts over ALL segmentations of the word, by forward–backward
    * on the same lattice [[segmentWord]] maximizes over. All transcendental
    * math uses `StrictMath` (bit-identical on every JVM) and each expected
    * count QUANTIZES to the 1e-6 grid before it leaves the word — so the
    * downstream corpus aggregation is an order-free BIGINT sum and the
    * whole E-step is deterministic (the repo's integer-grid discipline;
    * double sums across partitions would make training flaky).
    *
    * Returns `(piece, cmicro)` structs — cmicro = round(E[count] × 10⁶).
    * Words with an un-priceable char (no single-char piece, and the model
    * built WITHOUT unk during training never has one missing — trainers
    * keep every corpus char) fall back to the unk price, keeping the
    * lattice connected. */
  def expectations(word: UTF8String, model: UnigramModel): GenericArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val L = math.min(model.maxLen, n)
    // edge scores in nats (from micro grid); -inf = no edge
    val NegInf = Double.NegativeInfinity
    def edge(i: Int, j: Int): Double = {
      val piece = s.substring(i, j)
      val hit = model.table.get(piece)
      if (hit != null) hit.longValue() / 1e6
      else if (j - i == 1) model.unkScoreMicro / 1e6
      else NegInf
    }
    def logAdd(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else if (a >= b) a + StrictMath.log1p(StrictMath.exp(b - a))
      else b + StrictMath.log1p(StrictMath.exp(a - b))
    val alpha = Array.fill(n + 1)(NegInf)
    val beta = Array.fill(n + 1)(NegInf)
    alpha(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - L)
      while (i < j) {
        if (alpha(i) != NegInf) {
          val e = edge(i, j)
          if (e != NegInf) alpha(j) = logAdd(alpha(j), alpha(i) + e)
        }
        i += 1
      }
      j += 1
    }
    beta(n) = 0.0
    var i2 = n - 1
    while (i2 >= 0) {
      var k = i2 + 1
      val kMax = math.min(n, i2 + L)
      while (k <= kMax) {
        if (beta(k) != NegInf) {
          val e = edge(i2, k)
          if (e != NegInf) beta(i2) = logAdd(beta(i2), e + beta(k))
        }
        k += 1
      }
      i2 -= 1
    }
    val z = alpha(n)
    val acc = new java.util.LinkedHashMap[String, Double]()
    i2 = 0
    while (i2 < n) {
      var k = i2 + 1
      val kMax = math.min(n, i2 + L)
      while (k <= kMax) {
        val e = edge(i2, k)
        if (e != NegInf && alpha(i2) != NegInf && beta(k) != NegInf) {
          val post = StrictMath.exp(alpha(i2) + e + beta(k) - z)
          val piece = s.substring(i2, k)
          val prev = acc.get(piece)
          acc.put(piece, (if (prev == null) 0.0 else prev.doubleValue()) + post)
        }
        k += 1
      }
      i2 += 1
    }
    val rows = new Array[AnyRef](acc.size())
    val it = acc.entrySet().iterator()
    var w = 0
    while (it.hasNext) {
      val en = it.next()
      rows(w) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(en.getKey),
        StrictMath.round(en.getValue * 1e6)))
      w += 1
    }
    new GenericArrayData(rows)
  }
}

/** The E-step as a native expression: `array<struct<piece,cmicro>>` per
  * word — one lattice forward–backward per row, zero shuffle; the trainer
  * explodes and integer-sums the result (see [[UnigramApply.expectations]]
  * for the determinism contract). */
case class UnigramEStep(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_estep expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("cmicro", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    UnigramApply.expectations(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramApply.expectations($c, $modelRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEStep =
    copy(child = newChild)

  override def prettyName: String = "unigram_estep"
}
