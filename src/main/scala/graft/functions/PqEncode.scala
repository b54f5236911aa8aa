package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, FloatType}

/** Native Catalyst expression: product-quantization encode of an
  * `array<float>` vector against a trained codebook, with whole-stage
  * codegen.
  *
  * The composable form ([[graft.ops.Similarity.pqEncode]]'s lambda build:
  * per subspace an `array_min` over ks `aggregate(zip_with(...))` structs)
  * walks the vector m×ks times through interpreted lambda machinery and
  * allocates a struct array per subspace per row. This expression fuses
  * the whole encode into one pass: normalize once into a scratch buffer,
  * then m×ks×ds fused multiply-adds, zero per-row allocation beyond the
  * m-byte code array. Encode is the offline hot loop of PQ at 100 TB —
  * every vector passes through it exactly once per index build.
  *
  * Arithmetic is IDENTICAL to the composable form (same normalization
  * `x/sqrt(Σx²)` summed in index order, same squared-distance fold, same
  * lowest-code tie-break), so codes are bit-equal — OpsSpec pins it.
  *
  * The codebook rides in the expression as a literal (driver-sized by
  * design, a few KB); `codebooks(j)(c)(t)` = centroid c of subspace j.
  */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {

  private val m = codebooks.length
  private val ds = codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != m * ds)
      throw new graft.core.BadCallException(
        s"pq_encode: vector has $n dims, codebook expects ${m * ds} (m=$m × ds=$ds)")
    var norm = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble; norm += x * x; i += 1
    }
    norm = math.sqrt(norm)
    val nv = new Array[Double](n)
    i = 0
    while (i < n) {
      nv(i) = if (norm == 0.0) 0.0 else v.getFloat(i).toDouble / norm
      i += 1
    }
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = Double.MaxValue
      var bi = 0
      var c = 0
      while (c < codebooks(j).length) {
        val cent = codebooks(j)(c)
        var dist = 0.0
        var t = 0
        while (t < ds) {
          val diff = nv(j * ds + t) - cent(t); dist += diff * diff; t += 1
        }
        if (dist < best) { best = dist; bi = c }
        c += 1
      }
      out(j) = bi.toByte
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val books = ctx.addReferenceObj("pqBooks", codebooks,
      "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val norm = ctx.freshName("norm"); val nv = ctx.freshName("nv")
      val out = ctx.freshName("out"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val t = ctx.freshName("t")
      val best = ctx.freshName("best"); val bi = ctx.freshName("bi")
      val dist = ctx.freshName("dist"); val diff = ctx.freshName("diff")
      val cent = ctx.freshName("cent")
      s"""
         |int $n = $v.numElements();
         |if ($n != ${m * ds}) {
         |  throw new graft.core.BadCallException(
         |    "pq_encode: vector has " + $n + " dims, codebook expects ${m * ds} (m=$m × ds=$ds)");
         |}
         |double $norm = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double __x = (double) $v.getFloat($i); $norm += __x * __x;
         |}
         |$norm = java.lang.Math.sqrt($norm);
         |double[] $nv = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $nv[$i] = $norm == 0.0 ? 0.0 : ((double) $v.getFloat($i)) / $norm;
         |}
         |byte[] $out = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = Double.MAX_VALUE; int $bi = 0;
         |  for (int $c = 0; $c < $books[$j].length; $c++) {
         |    double[] $cent = $books[$j][$c];
         |    double $dist = 0.0;
         |    for (int $t = 0; $t < $ds; $t++) {
         |      double $diff = $nv[$j * $ds + $t] - $cent[$t];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $best) { $best = $dist; $bi = $c; }
         |  }
         |  $out[$j] = (byte) $bi;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
