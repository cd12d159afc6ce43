package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst kernels for the hot vector-scoring path.
  *
  * The composable formulation (`zip_with` + `aggregate`,
  * graft.functions.VectorFunctions) is semantically right but Spark's
  * higher-order functions are CodegenFallback: every element runs an
  * interpreted lambda. These expressions generate a tight primitive
  * loop inside WholeStageCodegen instead — the difference between an
  * interpreted 64-step fold per row and ~64 fused multiply-adds, which
  * is what a 100 TB scoring scan actually ships.
  *
  * Accumulation order is the same sequential left-to-right fold as
  * both the HOF formulation and DuckDB's list_dot_product, so scores
  * are bit-identical across all three (SURVEY.md §5 determinism
  * contract). Vectors are assumed non-null-elemented (enforced by the
  * index schema); lengths are clamped to the shorter side.
  */
abstract class VectorBinaryKernel extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemIsFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def genGet(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"

  /** Combine one element pair into the accumulator (interpreted path). */
  protected def combine(acc: Double, x: Double, y: Double): Double

  /** Java source for the loop body; must mirror `combine`. */
  protected def genCombine(acc: String, x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = combine(acc, getElem(left, x, i), getElem(right, y, i))
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${genCombine(acc, genGet(left, a, i), genGet(right, b, i))}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — the cosine/norm building block
  * (reference: item_selector.py:9-20 dot_product, re-expressed as a
  * codegen'd Catalyst expression).
  */
case class VectorDot(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "vector_dot"
  protected def combine(acc: Double, x: Double, y: Double): Double = acc + x * y
  protected def genCombine(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

/** Σ (aᵢ-bᵢ)² — squared L2 distance for IVF assignment. */
case class VectorL2Sq(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "vector_l2sq"
  protected def combine(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  protected def genCombine(acc: String, x: String, y: String): String =
    s"double _d = $x - $y; $acc += _d * _d;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorL2Sq =
    copy(left = l, right = r)
}
