package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash over distinct whitespace tokens as ONE scalar expression:
  * per-token 60-bit portable hash, ±1 votes per bit, sign-assembled —
  * bit-equal to the explode+groupBy form ([[graft.ops.Dedup.simhash]],
  * property-pinned in OpsSpec) but with no exploded intermediate, no
  * shuffle and no aggregation state: a pure map stage at 100 TB, and the
  * form a streaming Hamming-bucket dedup needs.
  *
  * Hash family: [[PortableHash.md5Long]] seed 0 (same md5-prefix integer
  * the DuckDB oracle reproduces); token set: [[WordShingles.shingle]] with
  * n=1 (first-occurrence-distinct split tokens, exactly
  * `array_distinct(split(text, " "))`).
  */
case class SimHash64(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60,
    s"simhash bits must be in [1, 60] (60-bit portable hash), got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  def simhash(text: UTF8String, bits: Int): Long = {
    val toks = WordShingles.shingle(text, 1) // distinct tokens, set semantics
    val votes = new Array[Int](bits)
    var i = 0
    val m = toks.numElements()
    while (i < m) {
      // raw 60-bit hash, no modulus — same value as PortableHash.md5Long(c, 0)
      val h = PortableHash.Jvm.md5Long60(toks.getUTF8String(i))
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}
