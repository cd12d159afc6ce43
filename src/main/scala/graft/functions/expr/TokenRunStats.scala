package graft.functions.expr

import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multiplicity statistics of a token array in one per-row pass:
  * returns [distinct_count, top_count] (top_count = multiplicity of
  * the most frequent element). The repetition signals
  * (TextAnalysis.repetition) are pure arithmetic over these two
  * numbers plus the array length.
  *
  * Why a kernel: the HOF formulation (array_sort + aggregate with a
  * struct-state lambda, twice per row, plus two array_distincts) is
  * CodegenFallback — an interpreted lambda per TOKEN on the corpus
  * scan's hot path, the exact cost the WordShingles/SimHash64 kernels
  * exist to avoid. Here: sort a copied reference array, one sweep.
  */
case class TokenRunStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_run_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenRunStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.TokenRunStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenRunStats =
    copy(child = newChild)
}

object TokenRunStats {

  /** Static entry for both interpreted eval and generated code. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array(0L, 0L))
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) { arr(i) = tokens.getUTF8String(i); i += 1 }
    Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    var distinct = 1L
    var run = 1L
    var best = 1L
    i = 1
    while (i < n) {
      if (arr(i).equals(arr(i - 1))) {
        run += 1
        if (run > best) best = run
      } else {
        distinct += 1
        run = 1
      }
      i += 1
    }
    new GenericArrayData(Array(distinct, best))
  }
}
