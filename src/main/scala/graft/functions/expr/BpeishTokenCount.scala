package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of matches of the BPE-ish token pattern
  * `[a-z]+|[0-9]+|[^a-z0-9\s]` — i.e. maximal lowercase-letter runs +
  * maximal digit runs + every other non-whitespace code point — as a
  * single character walk.
  *
  * The token-accounting operator only ever needs `size(matches)`, but
  * `size(regexp_extract_all(...))` still materializes every match as
  * a UTF8String through a java.util.regex matcher per row — at 100 TB
  * the allocation (not the count) is the scan cost. One branchy loop
  * with zero allocation computes the identical count: the pattern's
  * alternatives are disjoint character classes, so the regex's
  * leftmost-greedy scan is exactly "runs of [a-z], runs of [0-9],
  * single other non-\s code points" ("\s" being Java's ASCII set:
  * space \t \n \x0B \f \r). ASCII inputs walk bytes; a row with any
  * non-ASCII byte falls back to a code-point walk (Java regex matches
  * a supplementary character as ONE code point — the byte walk would
  * count its UTF-8 continuation bytes).
  */
case class BpeishTokenCount(child: Expression) extends UnaryExpression {

  override def prettyName: String = "bpeish_token_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def nullSafeEval(input: Any): Any =
    BpeishTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.BpeishTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeishTokenCount =
    copy(child = newChild)
}

object BpeishTokenCount {

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** Static entry for both interpreted eval and generated code. */
  def count(s: UTF8String): Long = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) return countCodePoints(s.toString)
      i += 1
    }
    var n = 0L
    // 0 = none, 1 = in [a-z] run, 2 = in [0-9] run
    var run = 0
    i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      if (c >= 'a' && c <= 'z') {
        if (run != 1) { n += 1; run = 1 }
      } else if (c >= '0' && c <= '9') {
        if (run != 2) { n += 1; run = 2 }
      } else {
        run = 0
        if (!isWs(c)) n += 1
      }
      i += 1
    }
    n
  }

  private def countCodePoints(str: String): Long = {
    var n = 0L
    var run = 0
    var i = 0
    while (i < str.length) {
      val c = str.codePointAt(i)
      if (c >= 'a' && c <= 'z') {
        if (run != 1) { n += 1; run = 1 }
      } else if (c >= '0' && c <= '9') {
        if (run != 2) { n += 1; run = 2 }
      } else {
        run = 0
        if (!isWs(c)) n += 1
      }
      i += Character.charCount(c)
    }
    n
  }
}
