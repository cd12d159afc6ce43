package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in ONE per-row pass: hash each
  * token, accumulate per-bit counts with multiplicity, emit the
  * majority-vote fingerprint (bit i set iff 2·count(i) > n — exactly
  * classic simhash and exactly Dedup.simHash's packed-aggregate
  * formulation, bit-for-bit).
  *
  * Why a kernel: the aggregate formulation explodes every token of
  * every document into rows and shuffles 17 longs per doc; as a
  * per-row expression the whole fingerprint pass is a NARROW map
  * stage — no explode, no shuffle — and, because it needs no
  * groupBy, it is STREAMING-safe (a stateless projection an ingest
  * gate can run on unbounded input; streaming aggregation would need
  * watermark/output-mode machinery for what is per-row arithmetic).
  *
  * `portable` picks the token hash: false = Spark's xxhash64 (seed
  * 42, fastest, engine-internal); true = the SURVEY §5 md5-derived
  * 64-bit hash ([[Md5Hash64]]), reproducible in any engine with md5 —
  * the dd_simhash oracle path. Null tokens are not expected (the
  * tokenizers never produce them) and would NPE, matching the
  * aggregate path's behavior of not defining them.
  */
case class SimHash64(child: Expression, portable: Boolean) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.SimHash64.compute($c, $portable)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** [[SimHash64]] over the CHARACTER n-grams of one string, fused into
  * a single kernel pass — for strings of at least n chars,
  * bit-identical to
  * `simhash64(transform(sequence(1, greatest(length(s)-(n-1), 0)),
  * i -> substring(s, i, n)))` but without materializing the gram
  * array: Catalyst evaluates higher-order-function lambdas per
  * element outside whole-stage codegen, and the substring chain
  * allocates one UTF8String per gram — at media-corpus scale
  * (~payload-length grams per row) that interpretation layer
  * dominated the signature pass. Here char→byte offsets are scanned
  * once per row and each gram's UTF8 byte range is hashed in place
  * (same md5/xxhash64 input bytes as the substring formulation, so
  * fingerprints are bit-identical and the shared oracles hold).
  *
  * SUB-n-CHAR strings carry zero grams and return the empty majority
  * vote 0 — NOT what the transform(sequence…) chain computed
  * (Spark's sequence(1, 0) is the DESCENDING [1, 0], so that
  * formulation hashed the whole sub-n string twice — round-16
  * advice). 0 is a sentinel with no perceptual content: callers must
  * exclude sub-n-char rows from pairing (Multimodal.contentSignatures
  * filters them, matching the mm_dedup oracle, which emits no
  * signature for them).
  */
case class CharShingleSimHash(child: Expression, n: Int, portable: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def prettyName: String = "char_shingle_simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharShingleSimHash.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.CharShingleSimHash.compute($c, $n, $portable)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleSimHash =
    copy(child = newChild)
}

object CharShingleSimHash {

  def compute(s: org.apache.spark.unsafe.types.UTF8String,
      n: Int, portable: Boolean): Long = {
    val bytes = s.getBytes
    // char-start byte offsets (UTF-8 continuation bytes have the top
    // two bits 10): charOff(c) = byte offset of char c, plus the
    // terminal offset so gram c spans [charOff(c), charOff(c + n))
    var numChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) numChars += 1
      i += 1
    }
    val charOff = new Array[Int](numChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { charOff(c) = i; c += 1 }
      i += 1
    }
    charOff(numChars) = bytes.length
    val grams = math.max(numChars - (n - 1), 0)
    val counts = new Array[Int](64)
    val md = if (portable) Md5Hash64.localDigest() else null
    var g = 0
    while (g < grams) {
      val from = charOff(g)
      val until = charOff(g + n)
      val h =
        if (portable) {
          md.reset()
          md.update(bytes, from, until - from)
          Md5Hash64.fold(md.digest())
        } else XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          until - from, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      g += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (2L * counts(b) > grams) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

object SimHash64 {

  /** Static entry for both interpreted eval and generated code. */
  def compute(tokens: ArrayData, portable: Boolean): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var k = 0
    while (k < n) {
      val t = tokens.getUTF8String(k)
      val h =
        if (portable) Md5Hash64.hash(t)
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var i = 0
      while (i < 64) {
        counts(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      k += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (2L * counts(i) > n) fp |= (1L << i)
      i += 1
    }
    fp
  }
}
