package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

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
  *
  * `normalize = false` is the RESIDUAL-encoding mode (IVFADC, Jégou
  * TPAMI'11 §IV): the input is already a residual `normalize(v) −
  * centroid(cluster)` (an `array<double>` column built upstream) and must
  * be quantized AS IS — re-normalizing a residual would destroy the
  * `‖q−x‖² = ‖q_res−x_res‖²` identity the residual ADC relies on. In that
  * mode `array<double>` input is accepted alongside `array<float>`. */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Double]]],
    normalize: Boolean = true) extends UnaryExpression {

  private val m = codebooks.length
  private val ds = codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float> or array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != m * ds)
      throw new graft.core.BadCallException(
        s"pq_encode: vector has $n dims, codebook expects ${m * ds} (m=$m × ds=$ds)")
    def elem(i: Int): Double =
      if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
    val nv = new Array[Double](n)
    var i = 0
    if (normalize) {
      var norm = 0.0
      while (i < n) { val x = elem(i); norm += x * x; i += 1 }
      norm = math.sqrt(norm)
      i = 0
      while (i < n) {
        nv(i) = if (norm == 0.0) 0.0 else elem(i) / norm
        i += 1
      }
    } else {
      while (i < n) { nv(i) = elem(i); i += 1 }
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

  /** Load (and optionally L2-normalize) the input into the scratch buffer;
    * element getter and the normalize branch are resolved at CODEGEN time,
    * so the emitted hot loop is branch-free. */
  private def genLoad(v: String, n: String, i: String, norm: String,
      nv: String): String = {
    val get = if (isDouble) s"$v.getDouble($i)" else s"(double) $v.getFloat($i)"
    if (normalize)
      s"""double $norm = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double __x = $get; $norm += __x * __x;
         |}
         |$norm = java.lang.Math.sqrt($norm);
         |for (int $i = 0; $i < $n; $i++) {
         |  $nv[$i] = $norm == 0.0 ? 0.0 : ($get) / $norm;
         |}""".stripMargin
    else
      s"""for (int $i = 0; $i < $n; $i++) { $nv[$i] = $get; }"""
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
         |double[] $nv = new double[$n];
         |${genLoad(v, n, i, norm, nv)}
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
