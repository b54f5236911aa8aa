package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-order-sensitive rolling-hash fingerprint as ONE scalar
  * expression: `acc = (acc*31 + codepoint) mod 1e9+7` over the string's
  * Unicode codepoints. Bit-equal to the composable
  * `aggregate(transform(sequence(..), ascii(substr(..))), ..)` fold
  * ([[PortableHash.rollingHashComposable]], property-pinned in OpsSpec) and
  * to the DuckDB `ord()` twin — Spark's `ascii` returns the first
  * CODEPOINT, same as `ord` — but one O(L) pass instead of the composable
  * form's O(L²) per-character substrs plus a per-row long-array
  * materialization. A pure map-stage fingerprint at 100 TB. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {

  val Mod: Long = 1000000007L

  def hash(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
