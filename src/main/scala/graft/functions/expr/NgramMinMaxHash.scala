package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Min/max of the portable 60-bit md5 hash over all sliding character
  * n-grams of a string, in one per-row pass: returns [min, max].
  *
  * Bit-identical to the column formulation it replaces
  * (`array_min/max(transform(charNgrams(t, n), portableHash))` with
  * portableHash = `conv(substring(md5(s),1,15),16,10)::long`, i.e. the
  * first 15 hex nibbles of the md5 digest) — the fingerprint oracle
  * (`'0x'||substr(md5(substr(t,i,n)),1,15)` in DuckDB) gates this.
  *
  * Why a kernel: the HOF formulation materialized ~|text| substring
  * copies per row, sorted them through array_distinct (irrelevant
  * under min/max), and paid hex-string md5 + base-16 conv per n-gram.
  * Here: one UTF-8 code-point offset index per row, then each window
  * is digested directly from the shared byte buffer — no per-n-gram
  * allocation beyond the digest's own state.
  *
  * N-gram positions count code points (matching both Spark `substr`
  * and DuckDB `substr`); texts shorter than n hash as one whole-text
  * window, mirroring `charNgrams`'s greatest(len-n+1, 1) guard.
  */
case class NgramMinMaxHash(child: Expression, n: Int) extends UnaryExpression {

  override def prettyName: String = "ngram_minmax_hash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramMinMaxHash.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.NgramMinMaxHash.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramMinMaxHash =
    copy(child = newChild)
}

object NgramMinMaxHash {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry for both interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // code-point byte-offset index: offsets(i) = byte start of char i,
    // offsets(nChars) = nBytes (UTF-8 continuation bytes are 10xxxxxx)
    val offsets = new Array[Int](nBytes + 1)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xc0) != 0x80) { offsets(nChars) = b; nChars += 1 }
      b += 1
    }
    offsets(nChars) = nBytes
    val windows = math.max(nChars - n + 1, 1)
    val md = digests.get()
    val out = new Array[Byte](16)
    var min = Long.MaxValue
    var max = Long.MinValue
    var w = 0
    while (w < windows) {
      val start = offsets(w)
      val end = offsets(math.min(w + n, nChars))
      md.reset()
      md.update(bytes, start, end - start)
      md.digest(out, 0, 16)
      // first 15 hex nibbles of the digest = top 8 bytes >>> 4 (60 bits)
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (out(i) & 0xffL); i += 1 }
      h = h >>> 4
      if (h < min) min = h
      if (h > max) max = h
      w += 1
    }
    new GenericArrayData(Array(min, max))
  }
}
