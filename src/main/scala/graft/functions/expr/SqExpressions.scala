package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Native Catalyst kernels for scalar quantization (the FAISS SQ8
  * shape): per-dimension uint8 codes against a (lo, step) grid.
  *
  * Codes live in ONE BinaryType column — dim bytes per row (4× less
  * I/O than float32, no per-element parquet overhead), read back as
  * `b[d] & 0xFF`. Both kernels run inside WholeStageCodegen as tight
  * primitive loops; the grid (lo/step/query terms) enters as literal
  * double-array children, so the scan stays a narrow projection.
  *
  * Determinism contract (SURVEY.md §5): every float step is the same
  * fixed op sequence left-to-right over d, so DuckDB replays both
  * encode and the ADC fold bit-for-bit:
  *   encode: c_d = step_d == 0 ? 0 : min(255, floor((x_d - lo_d) / step_d))
  *   adc:    acc += (qadj_d - c_d * step_d)²  (qadj precomputed by the
  *           caller as (q_d - lo_d) - 0.5 * step_d, one rounding shape)
  */
abstract class SqKernel extends TernaryExpression {

  protected def arrOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected def genGetVec(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double)$arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  protected def getVecElem(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }
}

/** vec × (lo, step) → dim uint8 codes packed in a byte array. */
case class SqEncode(first: Expression, second: Expression, third: Expression)
    extends SqKernel {

  override def prettyName: String = "sq_encode"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if arrOk(second.dataType) && arrOk(third.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<double>, array<double>)")
  }

  override def nullSafeEval(v: Any, lo: Any, step: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val l = lo.asInstanceOf[ArrayData]
    val s = step.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), l.numElements())
    val out = new Array[Byte](n)
    var d = 0
    while (d < n) {
      val st = s.getDouble(d)
      // clamp BOTH ends: a value below lo (possible when encoding new
      // rows against a persisted stale grid) must floor to code 0, not
      // wrap negative through the byte cast
      val c =
        if (st == 0.0) 0
        else math.max(0.0,
          math.min(255.0, math.floor((getVecElem(first, x, d) - l.getDouble(d)) / st))).toInt
      out(d) = c.toByte
      d += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, step) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val st = ctx.freshName("st")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $lo.numElements());
         |byte[] $out = new byte[$n];
         |for (int $d = 0; $d < $n; $d++) {
         |  double $st = $step.getDouble($d);
         |  int $c = $st == 0.0 ? 0 : (int) java.lang.Math.max(0.0, java.lang.Math.min(255.0,
         |    java.lang.Math.floor((${genGetVec(first, v, d)} - $lo.getDouble($d)) / $st)));
         |  $out[$d] = (byte) $c;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SqEncode = copy(f, s, t)
}

/** codes × (qadj, step) → Σ_d (qadj_d − c_d·step_d)² — the asymmetric
  *-distance fold over the byte codes (the query stays exact; each
  * term is the squared gap to the code's dequantized midpoint).
  */
case class SqAdc(first: Expression, second: Expression, third: Expression)
    extends SqKernel {

  override def prettyName: String = "sq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case BinaryType if arrOk(second.dataType) && arrOk(third.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<double>, array<double>)")
  }

  override def nullSafeEval(codes: Any, qadj: Any, step: Any): Any = {
    val b = codes.asInstanceOf[Array[Byte]]
    val qa = qadj.asInstanceOf[ArrayData]
    val s = step.asInstanceOf[ArrayData]
    val n = math.min(b.length, qa.numElements())
    var acc = 0.0
    var d = 0
    while (d < n) {
      val diff = qa.getDouble(d) - (b(d) & 0xff) * s.getDouble(d)
      acc += diff * diff
      d += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, qadj, step) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = java.lang.Math.min($codes.length, $qadj.numElements());
         |double $acc = 0.0;
         |for (int $d = 0; $d < $n; $d++) {
         |  double $diff = $qadj.getDouble($d) - ($codes[$d] & 0xff) * $step.getDouble($d);
         |  $acc += $diff * $diff;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SqAdc = copy(f, s, t)
}
