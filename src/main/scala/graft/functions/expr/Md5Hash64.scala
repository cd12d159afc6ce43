package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 8 bytes of md5(input), big-endian, as one signed long — the
  * SURVEY §5 portable 64-bit hash (any engine reproduces it from the
  * top 16 md5 hex digits). Semantically identical to
  *   shiftleft(conv(substring(md5(c),1,8),16,10), 32) |
  *   conv(substring(md5(c),9,8),16,10)
  * but ~one digest per value instead of a 32-char hex string plus two
  * substring/conv parses — dd_simhash hashes every token of every
  * document, so the wrapper chain was the map-stage cost (the
  * WordShingles lesson: per-token work must stay a tight kernel).
  * Codegen emits a static call; the expression stays inside
  * WholeStageCodegen.
  */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "md5_hash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Hash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.Md5Hash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash64 =
    copy(child = newChild)
}

object Md5Hash64 {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry for both interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    fold(d)
  }

  /** The thread's digest instance, for kernels that hash many byte
    * RANGES of one buffer (CharShingleSimHash) without a per-range
    * UTF8String/array copy. Callers must reset() before each use.
    */
  private[expr] def localDigest(): MessageDigest = digests.get()

  /** First 8 digest bytes big-endian as one signed long — the shared
    * tail of every md5-derived 64-bit hash here.
    */
  private[expr] def fold(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }
}
