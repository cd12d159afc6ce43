package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a constant string set, WITH
  * multiplicity (three occurrences of "the" count three) — the
  * stopword/marker scorer behind langId and quality.
  *
  * The composable formulation `size(filter(toks, t =>
  * t.isInCollection(set)))` is a higher-order function: Spark
  * interprets the lambda per element (CodegenFallback), and langId
  * runs FIVE of these per row plus quality's stopword pass — ~0.5B
  * interpreted evals on the 100× corpus. This kernel is one codegen'd
  * loop probing a HashSet held as a plan reference object
  * (addReferenceObj — the set is never inlined into generated source,
  * so large marker tables stay cheap to compile).
  */
case class TokensInSet(child: Expression, set: Seq[String]) extends UnaryExpression {

  override def prettyName: String = "tokens_in_set"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  @transient private lazy val probe: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && probe.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("probeSet", probe, "java.util.HashSet")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      s"""
         |int $n = 0;
         |int $len = $a.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokensInSet =
    copy(child = newChild)
}
