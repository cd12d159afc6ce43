package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of code points in [lo, hi] — the allocation-free form of
  * `length(s) - length(regexp_replace(s, "[\\u{lo}-\\u{hi}]", ""))`
  * (both count matched code points; Spark's `length` is numChars).
  * The language-ID operator uses it for the CJK override: the
  * regexp_replace formulation built a REPLACED COPY of every document
  * per row just to diff two lengths — on a non-CJK row that is a full
  * java.util.regex pass plus a same-size string allocation for a
  * constant 0. Here an all-ASCII row (the overwhelming case in a
  * mixed corpus when lo > 0x7f) is one branchless byte scan; only
  * rows with a non-ASCII byte walk code points.
  */
case class CodePointRangeCount(child: Expression, lo: Int, hi: Int)
    extends UnaryExpression {

  require(0 <= lo && lo <= hi, s"bad code-point range [$lo, $hi]")

  override def prettyName: String = "code_point_range_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def nullSafeEval(input: Any): Any =
    CodePointRangeCount.count(input.asInstanceOf[UTF8String], lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.CodePointRangeCount.count($c, $lo, $hi)")

  override protected def withNewChildInternal(newChild: Expression): CodePointRangeCount =
    copy(child = newChild)
}

object CodePointRangeCount {

  /** Static entry for both interpreted eval and generated code. */
  def count(s: UTF8String, lo: Int, hi: Int): Long = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length && ascii) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) {
      if (lo > 0x7f) return 0L
      var n = 0L
      i = 0
      while (i < bytes.length) {
        val c = bytes(i) & 0xff
        if (c >= lo && c <= hi) n += 1
        i += 1
      }
      n
    } else {
      val str = s.toString
      var n = 0L
      i = 0
      while (i < str.length) {
        val c = str.codePointAt(i)
        if (c >= lo && c <= hi) n += 1
        i += Character.charCount(c)
      }
      n
    }
  }
}
