package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping token windows of a text column as ONE native pass: split on
  * single spaces once, emit `array<struct<chunk: string, n_tok: int>>` —
  * window k (0-based) spans tokens [1 + k·stride, 1 + k·stride + width).
  * Tail windows shorter than `width` are kept.
  *
  * Why native: the composable `transform(sequence(...), s => slice(split(
  * text, " "), s, width))` form re-evaluates its free-variable `split` once
  * per window (no CSE inside lambda bodies — the same O(L²) trap
  * [[WordShingles]] fixes for shingling; for a 100k-token document at
  * stride 48 that is ~2000 re-splits of the full string). One pass here,
  * and chunk text is substring-sliced from the source (tokens are already
  * space-joined), so no per-window array materialization either.
  * Null text → null (the composable form emitted a phantom `width`-token
  * chunk for null rows because least/greatest skip nulls). */
case class WordChunks(child: Expression, width: Int, stride: Int)
  extends UnaryExpression {

  require(width >= 1 && stride >= 1 && stride <= width,
    s"need 1 <= stride <= width, got width=$width stride=$stride")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_chunks expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk", StringType, nullable = false),
      StructField("n_tok", IntegerType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordChunks.chunks(input.asInstanceOf[UTF8String], width, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordChunks.chunks($c, $width, $stride)")

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)

  override def prettyName: String = "word_chunks"
}

object WordChunks {

  /** Token spans by one scan over the string ([[WordShingles.tokenSpans]],
    * the single copy of the split-keeping-empties invariant), then each
    * window is one substring + one arithmetic token count. */
  def chunks(text: UTF8String, width: Int, stride: Int): ArrayData = {
    val s = text.toString
    val (starts, ends) = WordShingles.tokenSpans(s)
    val ntok = starts.length
    val nChunks = (ntok - 1) / stride + 1
    val out = new Array[Any](nChunks)
    var k = 0
    while (k < nChunks) {
      val from = k * stride
      val upto = math.min(from + width, ntok) - 1 // inclusive last token
      out(k) = InternalRow(
        UTF8String.fromString(s.substring(starts(from), ends(upto))),
        upto - from + 1)
      k += 1
    }
    new GenericArrayData(out)
  }
}
