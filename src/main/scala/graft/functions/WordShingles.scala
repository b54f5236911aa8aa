package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word `n`-gram shingles of a text column, as ONE native pass:
  * split on single spaces (keeping empty tokens, exactly like
  * `split(text, " ")` / DuckDB `str_split`), slide an `n`-window, dedup by
  * first occurrence (exactly `array_distinct` semantics). Texts with fewer
  * than `n` tokens shingle to `[text]` (the whole document is the shingle).
  *
  * Why native instead of the composable
  * `array_distinct(transform(sequence(...), i => concat_ws(" ", slice(split(text," "), i, n))))`:
  * a lambda body's free variables are re-evaluated PER ELEMENT — that
  * formulation re-splits the document once per shingle, turning an O(L)
  * shingling into O(L²) string work (measured 10× slower than a single
  * split at sf0.1). This expression splits once per row and emits the
  * shingle array in the same whole-stage-codegen span (the generated code
  * is one static call, same shape as Spark's own regexp expressions).
  *
  * Reference semantics: word-shingle near-dup candidates as in
  * parqueryd-style corpus dedup; see SURVEY.md §2 (fuzzy dedup family).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

/** ALL word n-gram window SLOTS (with duplicates, in order) — the
  * occurrence-counting companion to [[WordShingles]]' distinct sets, one
  * native pass with the same tokenization invariant ([[WordShingles.tokenSpans]]).
  * Texts with fewer than `n` tokens have no slots (EMPTY array — matching
  * [[graft.ops.TextAnalysis.ngramSlots]]' composable twin, which OpsSpec
  * pins bit-equal). Each slot is a substring of the source (tokens are
  * space-joined there already), so emission is O(total slot length) with
  * no per-token concatenation. */
case class NgramSlots(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_slots expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.allSlots(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.allSlots($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramSlots =
    copy(child = newChild)

  override def prettyName: String = "ngram_slots"
}

object WordShingles {

  /** Single-space token spans of `s`, keeping ALL tokens (leading/
    * trailing/empty) — exactly `split(text, " ")` (Pattern.split limit -1;
    * plain String.split(" ") would drop trailing empties). THE one copy of
    * this invariant: [[WordChunks]] slices the same spans, and every
    * cross-engine oracle depends on the two agreeing. Returns (starts,
    * ends) arrays, one entry per token. */
  def tokenSpans(s: String): (Array[Int], Array[Int]) = {
    var ntok = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') ntok += 1; i += 1 }
    val starts = new Array[Int](ntok)
    val ends = new Array[Int](ntok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = s.length
    (starts, ends)
  }

  /** Window the token spans by n, first-occurrence dedup. Called from both
    * interpreted eval and the generated code. */
  def shingle(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val (starts, ends) = tokenSpans(s)
    val ntok = starts.length
    if (ntok < n) return new GenericArrayData(Array[Any](text))
    // shingle k spans tokens [k, k+n): as substring starts(k)..ends(k+n-1)
    // (tokens are space-joined in the source string already)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var k = 0
    while (k + n <= ntok) {
      seen.add(UTF8String.fromString(s.substring(starts(k), ends(k + n - 1))))
      k += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** All n-token windows in order, duplicates kept; empty when ntok < n.
    * Called from both interpreted eval and the generated code. */
  def allSlots(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val (starts, ends) = tokenSpans(s)
    val ntok = starts.length
    if (ntok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](ntok - n + 1)
    var k = 0
    while (k + n <= ntok) {
      out(k) = UTF8String.fromString(s.substring(starts(k), ends(k + n - 1)))
      k += 1
    }
    new GenericArrayData(out)
  }
}
