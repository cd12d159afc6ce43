package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst kernels for 1-bit binary quantization — the rung
  * BELOW SQ8 on the compression ladder (32× smaller than float32:
  * dim/8 bytes per row). The production role is the cheapest possible
  * first-pass filter over a 100 TB vector scan: XOR+popcount over
  * 8-byte codes, then exact rerank of the bounded candidate set.
  *
  * Encoding is midpoint binarization: bit_d = x_d > mid_d with
  * mid_d = (lo_d + hi_d) · 0.5 from the corpus per-dimension min/max
  * (order-free aggregates — same determinism story as Sq.fit; a MEAN
  * threshold would be order-dependent in float and could flip bits
  * between engines). Bits pack LSB-first: bit d lives at
  * byte[d >>> 3] bit (d & 7).
  *
  * Both kernels run inside WholeStageCodegen as tight primitive
  * loops; thresholds / query codes enter as literal children so the
  * candidate scan stays a narrow (id, codes) projection.
  */
object BqKernel {

  /** Driver-side encode — MUST mirror BqEncode's loop exactly (the
    * query vector is encoded on the driver, corpus rows in the
    * kernel; a drift between the two silently skews every hamming
    * distance).
    */
  def encodeLocal(v: Array[Double], mid: Array[Double]): Array[Byte] = {
    val n = math.min(v.length, mid.length)
    val out = new Array[Byte]((n + 7) >>> 3)
    var d = 0
    while (d < n) {
      if (v(d) > mid(d)) out(d >>> 3) = (out(d >>> 3) | (1 << (d & 7))).toByte
      d += 1
    }
    out
  }
}

/** vec × mid → packed sign bits (ceil(dim/8) bytes, LSB-first). */
case class BqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bq_encode"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<double>)")
  }

  private def genGetVec(arr: String, i: String): String =
    left.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double)$arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  override def nullSafeEval(v: Any, mid: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = mid.asInstanceOf[ArrayData]
    val isFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = math.min(x.numElements(), m.numElements())
    val out = new Array[Byte]((n + 7) >>> 3)
    var d = 0
    while (d < n) {
      val xv = if (isFloat) x.getFloat(d).toDouble else x.getDouble(d)
      if (xv > m.getDouble(d)) out(d >>> 3) = (out(d >>> 3) | (1 << (d & 7))).toByte
      d += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mid) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $mid.numElements());
         |byte[] $out = new byte[($n + 7) >>> 3];
         |for (int $d = 0; $d < $n; $d++) {
         |  if (${genGetVec(v, d)} > $mid.getDouble($d)) {
         |    $out[$d >>> 3] = (byte) ($out[$d >>> 3] | (1 << ($d & 7)));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BqEncode = copy(l, r)
}

/** codes × query-codes → Hamming distance (XOR + popcount per byte). */
case class BqHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bq_hamming"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (binary, binary)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Integer.bitCount((x(i) ^ y(i)) & 0xff)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xff);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BqHamming = copy(l, r)
}
