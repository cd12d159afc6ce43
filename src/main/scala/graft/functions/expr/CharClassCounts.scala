package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One pass over a (pre-normalized, lowercase) string returning
  * [nPunct, nAlpha]: counts of characters outside [a-z0-9 ] and
  * inside [a-z] — the quality-score character ratios.
  *
  * The regexp_replace length-diff formulation allocates a full
  * replaced COPY of the text per ratio per row (two extra ~1KB
  * strings and two regex scans); this is a single allocation-free
  * byte scan. Non-ASCII bytes (UTF-8 continuation/lead) count as
  * punctuation exactly like the `[^a-z0-9 ]`-per-CHARACTER regex —
  * multi-byte chars add >1 to the byte count, so the kernel counts
  * CODE POINTS, not bytes, to stay value-identical with the regex
  * (and with DuckDB's per-character oracle).
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def prettyName: String = "char_class_counts"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var punct = 0
    var alpha = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val c = cp.toChar
      if (cp >= 'a' && cp <= 'z') alpha += 1
      else if (!((cp >= '0' && cp <= '9') || c == ' ')) punct += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(punct, alpha))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val punct = ctx.freshName("punct")
      val alpha = ctx.freshName("alpha")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $a.toString();
         |int $punct = 0; int $alpha = 0; int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  if ($cp >= 'a' && $cp <= 'z') $alpha++;
         |  else if (!(($cp >= '0' && $cp <= '9') || $cp == ' ')) $punct++;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[]{$punct, $alpha});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}
