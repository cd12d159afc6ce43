package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Drop every token covered by a duplicated window: given a token
  * array and the (unordered, possibly overlapping) START positions of
  * the doc's duplicated `span`-token windows, return the tokens whose
  * position falls under NO window [start, start+span-1] — the rewrite
  * step of exact-substring dedup (Lee et al. 2022), executed per ROW
  * so corpus text never shuffles: the only exchanged state is the
  * narrow (id, starts) frame joined in before this projection.
  *
  * One sort of the start list + a single merged-interval walk over the
  * tokens (O(n + m log m)); overlapping and truncated windows (a doc
  * shorter than `span` has one window covering everything) fall out of
  * the same max-end sweep. Returns an ARRAY so the caller composes
  * `size()` / `array_join()` (both codegen'd) for counts and text.
  */
case class DropSpanTokens(left: Expression, right: Expression, span: Int)
    extends BinaryExpression {

  override def prettyName: String = "drop_span_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if span >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>) inputs and span >= 1")
    }

  override def nullSafeEval(tokens: Any, starts: Any): Any =
    DropSpanTokens.dropTokens(tokens.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], span)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.expr.DropSpanTokens.dropTokens($t, $s, $span)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DropSpanTokens =
    copy(left = newLeft, right = newRight)
}

object DropSpanTokens {

  /** Static entry for both interpreted eval and generated code. */
  def dropTokens(tokens: ArrayData, starts: ArrayData, span: Int): GenericArrayData = {
    val n = tokens.numElements()
    val m = starts.numElements()
    val st = new Array[Int](m)
    var i = 0
    while (i < m) { st(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(st)
    val out = new Array[AnyRef](n)
    var w = 0
    var j = 0
    var maxEnd = -1 // rightmost covered position among windows starting <= i
    i = 0
    while (i < n) {
      while (j < m && st(j) <= i) {
        val e = st(j) + span - 1
        if (e > maxEnd) maxEnd = e
        j += 1
      }
      if (i > maxEnd) { out(w) = tokens.getUTF8String(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == n) out else java.util.Arrays.copyOf(out, w))
  }
}
