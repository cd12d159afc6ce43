package graft.functions.expr

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-expression PII scrub: struct(redacted, n_email, n_ip,
  * n_card, n_phone) in ONE evaluation per row.
  *
  * Semantics are EXACTLY the round-2 formulation (and the DuckDB
  * oracle): a sequential regexp_replace fold (email → ip → card →
  * phone, each pass running on the output of the previous) plus
  * per-rule match counts taken on the ORIGINAL text. The fold order
  * is observable — e.g. an address like `a@b.com1.2.3.4` only gains
  * a digit-leading word boundary after `<EMAIL>` is substituted — so
  * the kernel keeps the same java.util.regex engine and pass
  * structure rather than hand-rolling a scanner whose boundary
  * semantics could drift from the oracle's.
  *
  * What it eliminates vs the 9-node column formulation
  * (4 regexp_replace + 4 regexp_extract_all + size): thirteen
  * UTF8String↔String conversions per row become two; the four
  * extract_all passes stop materializing arrays of matched
  * substrings just to take their length; the count and replace scans
  * share one matcher pass whenever the running text is still the
  * original; and texts with no '@' / no digit skip the respective
  * passes entirely after one cheap pre-scan. The codegen path is a
  * single static call, so the expression stays inside
  * WholeStageCodegen (same pattern as CharClassCounts).
  */
case class RedactPii(child: Expression) extends UnaryExpression {

  override def prettyName: String = "redact_pii"

  override def dataType: DataType = RedactPii.OutType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    RedactPii.run(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expr.RedactPii.run($a);")

  override protected def withNewChildInternal(newChild: Expression): RedactPii =
    copy(child = newChild)
}

object RedactPii {

  val OutType: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_email", LongType, nullable = false),
    StructField("n_ip", LongType, nullable = false),
    StructField("n_card", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false)))

  // Compiled once per JVM from the canonical pattern strings in
  // graft.text.Redact (the same strings the oracle SQL embeds).
  private lazy val EmailP = Pattern.compile(graft.text.Redact.Email)
  private lazy val IpP = Pattern.compile(graft.text.Redact.Ipv4)
  private lazy val CardP = Pattern.compile(graft.text.Redact.CardLike)
  private lazy val PhoneP = Pattern.compile(graft.text.Redact.PhoneLike)

  /** Count matches of `p` on `orig` and apply the replacement to
    * `cur` (the running fold text). When `cur eq orig` — no earlier
    * rule fired — one matcher pass does both; otherwise the count
    * runs on the original (cheap: no buffer is built) and the
    * replacement on the running text, preserving the fold-order
    * boundary semantics above.
    */
  private def countAndReplace(p: Pattern, orig: String, cur: String,
      repl: String): (Long, String) = {
    if (cur eq orig) {
      val m = p.matcher(orig)
      var n = 0L
      var sb: java.lang.StringBuilder = null
      while (m.find()) {
        n += 1
        if (sb == null) sb = new java.lang.StringBuilder(orig.length + 16)
        m.appendReplacement(sb, repl)
      }
      if (sb == null) (n, cur)
      else { m.appendTail(sb); (n, sb.toString) }
    } else {
      val mc = p.matcher(orig)
      var n = 0L
      while (mc.find()) n += 1
      val mr = p.matcher(cur)
      var sb: java.lang.StringBuilder = null
      while (mr.find()) {
        if (sb == null) sb = new java.lang.StringBuilder(cur.length + 16)
        mr.appendReplacement(sb, repl)
      }
      val out = if (sb == null) cur else { mr.appendTail(sb); sb.toString }
      (n, out)
    }
  }

  def run(u: UTF8String): InternalRow = {
    val s0 = u.toString
    // pre-scan: a text with no '@' cannot match the email rule, one
    // with no digit cannot match ip/card/phone (the replacement
    // tokens are digit-free, so no later pass can introduce digits)
    var hasAt = false
    var hasDigit = false
    var i = 0
    val len = s0.length
    while (i < len && !(hasAt && hasDigit)) {
      val c = s0.charAt(i)
      if (c == '@') hasAt = true
      else if (c >= '0' && c <= '9') hasDigit = true
      i += 1
    }
    var s = s0
    var nEmail = 0L; var nIp = 0L; var nCard = 0L; var nPhone = 0L
    if (hasAt) {
      val r = countAndReplace(EmailP, s0, s, "<EMAIL>")
      nEmail = r._1; s = r._2
    }
    if (hasDigit) {
      val r1 = countAndReplace(IpP, s0, s, "<IP>")
      nIp = r1._1; s = r1._2
      val r2 = countAndReplace(CardP, s0, s, "<CARD>")
      nCard = r2._1; s = r2._2
      val r3 = countAndReplace(PhoneP, s0, s, "<PHONE>")
      nPhone = r3._1; s = r3._2
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(s), nEmail, nIp, nCard, nPhone))
  }
}
