package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The complete k-hash MinHash signature of a text column as ONE scalar
  * expression: shingle → md5 base hash → k affine minima, all inside the
  * row's whole-stage-codegen span. Bit-equal to the aggregation forms
  * ([[graft.ops.Dedup.minhashSignatures]] conditional-min and
  * [[MinHashSketch]]) — property-pinned in OpsSpec — but with a radically
  * better scale shape: NO exploded (doc, shingle) intermediate, NO shuffle,
  * NO aggregation state. Signatures are embarrassingly parallel per row, so
  * at 100 TB this is a pure map stage fused into the scan, and it is the
  * form a STREAMING near-dup filter needs (`dropDuplicates` on the
  * signature/bands is stateful-but-bounded; an explode+groupBy per document
  * is not expressible pre-dedup in an append-mode stream).
  *
  * The aggregation forms remain the right tool when the exploded shingle
  * set is needed anyway (exact-verify arrays, document frequency); this
  * expression is for signature-only consumers: banding, streaming dedup,
  * signature fingerprint columns. Hash family: [[PortableHash]] (shared
  * constants), shingling: [[WordShingles.shingle]] (shared helper).
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
  extends UnaryExpression {

  require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSignature.signature($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {

  private val P = PortableHash.MinhashP

  // affine coefficients per k, computed once per JVM (not per row)
  private val coeffs =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coeffsFor(k: Int): (Array[Long], Array[Long]) =
    coeffs.computeIfAbsent(k, kk =>
      ((0 until kk).map(PortableHash.derivedA).toArray,
        (0 until kk).map(PortableHash.derivedB).toArray))

  /** One pass over the document's distinct shingles maintaining all k
    * minima — called from both interpreted eval and generated code. */
  def signature(text: UTF8String, n: Int, k: Int): ArrayData = {
    val shingles = WordShingles.shingle(text, n)
    val (as, bs) = coeffsFor(k)
    var j = 0
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val m = shingles.numElements()
    while (i < m) {
      val h = PortableHash.Jvm.baseHash(shingles.getUTF8String(i))
      j = 0
      while (j < k) {
        val hj = (h * as(j) + bs(j)) % P
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
