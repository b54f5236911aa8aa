package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained WordPiece vocabulary (BERT-family): word-INITIAL pieces are
  * stored bare, mid-word CONTINUATION pieces carry the `##` prefix, and
  * `unkToken` is the all-or-nothing escape for unsegmentable words. The
  * `##` prefix IS the classifier — a piece starting with `##` is a
  * continuation by definition, so a literal initial piece may not start
  * with `##` (rejected at construction; no real vocab has one).
  *
  * Driver-sized by contract (BERT ships 30k pieces ≈ a few hundred KB —
  * the [[BpeModel]] budget class) and shipped to executors inside the
  * expression via `addReferenceObj`. Lookup tables rebuild lazily per
  * deserialized copy. Piece spans are capped at
  * [[WordPieceApply.MaxPieceSpan]] chars, which bounds the greedy
  * longest-match scan per position AND the DuckDB oracle's candidate
  * join. */
final class WordPieceModel(val pieces: Array[String], val unkToken: String)
    extends Serializable {
  locally {
    require(pieces.nonEmpty, "wordpiece vocab must be non-empty")
    require(unkToken != null && unkToken.nonEmpty, "unk token must be non-empty")
    val seen = new java.util.HashSet[String]()
    pieces.foreach { p =>
      require(p != null && p.nonEmpty, "wordpiece piece must be non-empty")
      val span = if (p.startsWith("##")) p.length - 2 else p.length
      require(span >= 1, s"continuation piece with empty suffix: '$p'")
      require(span <= WordPieceApply.MaxPieceSpan,
        s"piece spans more than ${WordPieceApply.MaxPieceSpan} chars: '$p'")
      require(seen.add(p), s"duplicate wordpiece piece: '$p'")
    }
  }

  @transient lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(s.add)
    s
  }

  /** Longest raw char span among initial / continuation pieces — the
    * greedy scan never probes substrings longer than these. */
  @transient lazy val maxInitSpan: Int =
    pieces.iterator.filterNot(_.startsWith("##")).map(_.length)
      .foldLeft(0)(math.max)
  @transient lazy val maxContSpan: Int =
    pieces.iterator.filter(_.startsWith("##")).map(_.length - 2)
      .foldLeft(0)(math.max)

  override def toString: String = s"WordPieceModel(${pieces.length} pieces)"
}

/** WordPiece SEGMENTATION (greedy longest-match-first, BERT's
  * `WordpieceTokenizer`) as one native per-row pass: pre-tokenize with
  * [[BpeApply.TokenPatternString]] (the SAME pre-tokenizer as the BPE and
  * unigram paths — all three tokenizers meter one word stream, so their
  * budgets compare apples-to-apples), then per word repeatedly take the
  * LONGEST vocab piece matching at the cursor (bare at position 0,
  * `##`-prefixed past it) and advance. If any position matches nothing,
  * the WHOLE word maps to the single unk token — BERT's all-or-nothing
  * rule, deliberately distinct from unigram's per-char fallback.
  *
  * No tie-break is needed: at a fixed position, equal-length candidates
  * are the same substring, and the vocab is duplicate-free — greedy is
  * fully deterministic. Greedy is also NOT globally optimal (a longer
  * first piece can force a worse tail than a shorter one would); that is
  * the published algorithm's semantics, and q262's planted vocab pins
  * one such case so the contract is explicit.
  *
  * Scale shape: zero shuffle — a projection inside whole-stage codegen;
  * per-word cost O(len × maxPieceSpan) hash probes. */
case class WordPieceApply(child: Expression, model: WordPieceModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wordpiece_apply expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordPieceApply.encode(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("wordPieceModel", model,
      classOf[WordPieceModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceApply.encode($c, $modelRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceApply =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_apply"
}

object WordPieceApply {

  /** Hard cap on a piece's RAW char span (continuation `##` excluded) —
    * bounds the greedy scan and the oracle's unrolled candidate join. */
  val MaxPieceSpan = 16

  private val TokenPattern =
    java.util.regex.Pattern.compile(BpeApply.TokenPatternString)

  def encode(text: UTF8String, model: WordPieceModel): GenericArrayData = {
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

  /** Greedy longest-match-first on one pre-token (see [[WordPieceApply]]
    * for the exact contract). */
  def segmentWord(word: String, model: WordPieceModel): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val out = new java.util.ArrayList[String](4)
    var start = 0
    while (start < n) {
      val maxSpan = math.min(
        if (start == 0) model.maxInitSpan else model.maxContSpan,
        n - start)
      var span = maxSpan
      var found: String = null
      while (span >= 1 && found == null) {
        val sub = word.substring(start, start + span)
        val cand = if (start == 0) sub else "##" + sub
        if (model.table.contains(cand)) found = cand
        span -= 1
      }
      if (found == null) return Array(model.unkToken)
      out.add(found)
      start += (if (found.startsWith("##")) found.length - 2 else found.length)
    }
    val arr = new Array[String](out.size)
    out.toArray(arr)
    arr
  }
}

/** A WordPiece TRAINING merge list over the marked-symbol alphabet: a
  * word's initial symbol is its first char bare, every later char carries
  * `##`; a merge `(a, b)`'s right operand is therefore always a
  * continuation and the product is `a + b-without-##` (the left operand's
  * marking survives). Same well-formedness rule as [[BpeModel]]: each
  * operand is a single marked symbol or the product of an EARLIER merge —
  * what makes the min-rank priority loop here and the oracle's
  * rank-order sweep agree. Driver-sized by the same contract. */
final class WordPieceMergeModel(val merges: Array[(String, String)])
    extends Serializable {
  locally {
    val produced = new java.util.HashSet[String]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      def single(s: String): Boolean = {
        val raw = if (s.startsWith("##")) s.substring(2) else s
        raw.codePointCount(0, raw.length) == 1
      }
      require(b.startsWith("##"),
        s"ill-formed wordpiece merge at rank $i: right operand '$b' is not a continuation")
      require((single(a) || produced.contains(a)) &&
          (single(b) || produced.contains(b)),
        s"ill-formed wordpiece merge list at rank $i: ($a, $b) has an " +
          "operand that no earlier merge produces")
      produced.add(a + b.substring(2))
    }
  }

  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + " " + merges(i)._2, i)
      i += 1
    }
    m
  }

  override def toString: String = s"WordPieceMergeModel(${merges.length} merges)"
}

/** Trainer-side segmentation under a [[WordPieceMergeModel]]: pre-tokenize,
  * mark each word's chars (`c₀, ##c₁, ##c₂ …`), then run [[BpeApply]]'s
  * min-rank merge loop over the marked alphabet. This is what the
  * WordPiece TRAINER counts pairs over each round (an empty merge list
  * degenerates to the marked-char segmentation round 0 starts from); the
  * SERVING path is [[WordPieceApply]] against the finished vocab —
  * HuggingFace's trainer/apply split, kept here for the same reason. */
case class WordPieceSegment(child: Expression, model: WordPieceMergeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordPieceSegment.encode(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("wordPieceMerges", model,
      classOf[WordPieceMergeModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceSegment.encode($c, $modelRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceSegment =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_segment"
}

object WordPieceSegment {

  private val TokenPattern =
    java.util.regex.Pattern.compile(BpeApply.TokenPatternString)

  def encode(text: UTF8String, model: WordPieceMergeModel): GenericArrayData = {
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

  /** Marked-char init + the [[BpeApply.encodeWord]] min-rank loop with
    * wordpiece product semantics (`a + b-without-##`). */
  def segmentWord(word: String, model: WordPieceMergeModel): Array[String] = {
    var syms = {
      val buf = new java.util.ArrayList[String]()
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        val raw = word.substring(i, i + n)
        buf.add(if (i == 0) raw else "##" + raw)
        i += n
      }
      buf
    }
    val ranks = model.ranks
    var done = syms.size < 2
    while (!done && syms.size > 1) {
      var bestRank = Integer.MAX_VALUE
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Integer.MAX_VALUE) done = true
      else {
        val (a, b) = model.merges(bestRank)
        val merged = a + b.substring(2)
        val next = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
            next.add(merged); j += 2
          } else { next.add(syms.get(j)); j += 1 }
        }
        syms = next
      }
    }
    val arr = new Array[String](syms.size)
    syms.toArray(arr)
    arr
  }
}
