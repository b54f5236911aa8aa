package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon character entropy of a string, bits/char, as ONE native per-row
  * pass — the zero-shuffle replacement for the explode-per-character →
  * two-level-aggregate formulation ([[graft.ops.TextAnalysis.charEntropyComposable]],
  * kept as the executable spec): per-document character counts are bounded
  * state (≤ alphabet size), so there is nothing to distribute — the
  * exploded form paid a full exchange + hash-agg pass on the hottest
  * (quality-scoring) path for a statistic a map stage computes exactly.
  * Measured at sf0.1 (documents table, noop-write, min of 3): 0.57 s
  * composable → 0.17 s native (3.4×) — the exchange and both agg passes
  * disappear; what remains is the parquet scan + this projection.
  *
  * Arithmetic matches the aggregate form's factoring exactly:
  * H = (ln L − Σ c·ln c / L) / ln 2 over per-CODEPOINT counts c (Spark's
  * `split(text, '')` and `length()` are both codepoint-based, as is the
  * DuckDB `generate_series(1, length)`/`substr` oracle). The Σ runs in
  * ascending-codepoint order — a fixed, layout-independent order, unlike
  * the hash-agg's partition order; both land on identical doubles after
  * the round-6 discipline (OpsSpec pins the rounded equality).
  * Empty strings return 0.0 (callers filter them out first — the
  * DataFrame-level contract is that empty texts emit NO row). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.entropyBits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharEntropy.entropyBits($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropy {

  /** H in bits/char over codepoint counts; 0.0 for the empty string.
    * Called from both interpreted eval and the generated code. */
  def entropyBits(text: UTF8String): Double = {
    val s = text.toString
    // ascending-codepoint order makes the Σ c·ln c deterministic across
    // layouts and reruns (the aggregate twin's order is partition-driven)
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var total = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
      total += 1L
    }
    if (total == 0L) return 0.0
    var clc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      clc += c * math.log(c)
    }
    (math.log(total.toDouble) - clc / total) / math.log(2.0)
  }
}

/** Most frequent word n-gram of a string with its occurrence count, as ONE
  * native per-row pass returning `struct(gram string, cnt bigint)` — the
  * zero-shuffle replacement for the explode-slots → per-(doc,gram) count →
  * per-doc top-1 window formulation
  * ([[graft.ops.TextAnalysis.topNgramCharFractionComposable]], kept as the
  * executable spec): the per-document gram table is bounded by document
  * size, so the exploded form's exchange + hash-agg + id-partitioned
  * window all collapse into a map stage. Measured at sf0.1 (documents
  * table, n=3, noop-write, min of 3): 0.60 s composable → 0.19 s native
  * (3.2×).
  *
  * Ties break to the SMALLEST gram in UTF8String (binary) order — exactly
  * the `orderBy(cnt.desc, gram)` of the window form and DuckDB's collation
  * on the oracle side. Tokenization is [[WordShingles.tokenSpans]], THE
  * single copy of the split-on-single-space invariant; texts with fewer
  * than n tokens return `("", 0)`, matching the left-join convention. */
case class NgramTop(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_top expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    NgramTop.top(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramTop.top($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramTop =
    copy(child = newChild)

  override def prettyName: String = "ngram_top"
}

object NgramTop {

  /** (most frequent n-gram, count); ("", 0) when the text has no slots.
    * Called from both interpreted eval and the generated code. */
  def top(text: UTF8String, n: Int): InternalRow = {
    val s = text.toString
    val (starts, ends) = WordShingles.tokenSpans(s)
    val ntok = starts.length
    if (ntok < n)
      return new GenericInternalRow(Array[Any](UTF8String.fromString(""), 0L))
    val counts = new java.util.HashMap[String, Array[Long]]()
    var k = 0
    while (k + n <= ntok) {
      val gram = s.substring(starts(k), ends(k + n - 1))
      val slot = counts.get(gram)
      if (slot == null) counts.put(gram, Array(1L)) else slot(0) += 1L
      k += 1
    }
    var bestGram: UTF8String = null
    var bestCnt = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue()(0)
      val g = UTF8String.fromString(e.getKey)
      // (cnt desc, gram asc in binary order) — the window form's ordering
      if (cnt > bestCnt || (cnt == bestCnt &&
          (bestGram == null || g.compareTo(bestGram) < 0))) {
        bestGram = g; bestCnt = cnt
      }
    }
    new GenericInternalRow(Array[Any](bestGram, bestCnt))
  }
}
