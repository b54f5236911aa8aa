package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-membership probe over a broadcast sketch — the codegen
  * replacement for the per-row Scala UDF that used to guard
  * [[graft.ops.Dedup.antiJoinWithBloom]]'s verify join: a ScalaUDF pays
  * UTF8String→String SerDe per row and sits as an opaque invoke inside the
  * generated code, on the decontamination path that exists precisely to make
  * the common case (definite absence) cheap. This expression fuses into
  * WholeStageCodegen as one virtual call on the broadcast value (PlanSpec
  * pins the absence of any UDF node in the q119 scan stage).
  *
  * The probe hashes the key's raw UTF-8 bytes (`mightContainBinary`), which
  * is hash-identical to the `putString` the builder
  * (`DataFrameStatFunctions.bloomFilter`) used — Spark's sketch defines
  * `putString(s) = putBinary(utf8(s))` — so no String materializes per row
  * (OpsSpec pins bit-equality against the UDF formulation).
  *
  * NULL contract matches the UDF it replaces: a NULL key yields FALSE (not
  * NULL) — "definitely absent", which the caller's `when(probe, key)` turns
  * into a null join key that passes the anti join untouched. The expression
  * is therefore non-nullable.
  *
  * The sketch travels as a `Broadcast` handle, not embedded bytes: the
  * expression tree serializes into each stage's task binary, and a 100 TB
  * corpus filter can be ~1 GB of bits — executors must fetch it once via
  * the broadcast store, never once per task serialization. */
case class BloomMightContainKey(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a string key, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    BloomMightContainKey.might(bloom, child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the broadcast through the public abstract class — the
    // runtime TorrentBroadcast is Spark-internal and not a name the
    // generated code should utter
    val bc = ctx.addReferenceObj("graftBloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = !${childGen.isNull} &&
          ((org.apache.spark.util.sketch.BloomFilter) $bc.value())
            .mightContainBinary(${childGen.value}.getBytes());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainKey =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContainKey {

  /** Interpreted twin of the generated code: false for NULL, else a raw
    * UTF-8-bytes probe (hash-identical to the builder's putString). */
  def might(bc: Broadcast[BloomFilter], key: UTF8String): Boolean =
    key != null && bc.value.mightContainBinary(key.getBytes)
}
