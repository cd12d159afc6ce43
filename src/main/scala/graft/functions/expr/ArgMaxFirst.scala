package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** 0-based index of the FIRST maximum of an array<int> (-1 for an
  * empty array) — the argmax that replaces a when/greatest pick tree.
  *
  * Why a kernel for something this small: the declarative argmax over
  * k scores expands `greatest(s1..sk)` INSIDE every `when` branch, so
  * the generated projection repeats the comparison tree ~2k+1 times.
  * At k=5 with element_at scores that expansion pushed the langId
  * projection past the JIT's huge-method bytecode limit — the stage
  * ran as INTERPRETED bytecode and the pick layer alone cost 8× the
  * tokenize+probe work it was choosing between (measured: 6.5 s vs
  * 0.8 s at the 100× corpus). One 5-element loop keeps the method
  * tiny; the pick becomes a flat CASE over this index.
  *
  * Ties resolve to the lowest index — the same first-in-sequence
  * priority the foldRight when-chain encoded.
  */
case class ArgMaxFirst(child: Expression) extends UnaryExpression {

  override def prettyName: String = "arg_max_first"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ArgMaxFirst.argMax(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.ArgMaxFirst.argMax($c)")

  override protected def withNewChildInternal(newChild: Expression): ArgMaxFirst =
    copy(child = newChild)
}

object ArgMaxFirst {

  /** Static entry for both interpreted eval and generated code.
    * Null elements are skipped (a value must be PRESENT to win).
    */
  def argMax(arr: ArrayData): Int = {
    val n = arr.numElements()
    var bestIdx = -1
    var best = Int.MinValue
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getInt(i)
        if (bestIdx == -1 || v > best) { best = v; bestIdx = i }
      }
      i += 1
    }
    bestIdx
  }
}
