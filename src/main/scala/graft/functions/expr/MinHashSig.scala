package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.dedup.Dedup.{MinHashMix, MinHashP}

/** Full MinHash signature of a token array in ONE per-row pass:
  * [h_0 .. h_{nHashes-1}] with
  * h_s = min over word `shingleLen`-shingles of
  * (base(g)·(2s+1) + 7919·s) mod P, base(g) = 60-bit md5 hash mod P —
  * the exact arithmetic of Dedup.minHashSignatures' column
  * formulation (explode distinct shingles → portableHash → nHashes
  * min-aggregates), which every MinHash oracle replays in SQL.
  *
  * Why a kernel (round 10): the explode+groupBy formulation pays, per
  * corpus shingle, a generated-row emit, a hash-aggregate probe per
  * posting, and the UTF8String concat materializing the shingle —
  * none of which contribute to the signature. Here each window is
  * digested directly from the token bytes (md.update per token + one
  * separator byte — the md5 input is byte-identical to the joined
  * string), and the nHashes running minima live in one primitive
  * array. No explode, no shuffle: signatures are per-doc values, so
  * the map stage emits exactly one row per document — the same shape
  * that made SimHash64 the fingerprint of choice for streams.
  *
  * Shingle DISTINCTness is dropped deliberately: min over a multiset
  * equals min over its support, so duplicate shingles cannot change
  * any h_s. Window semantics mirror WordShingles: max(len-n+1, 1)
  * positional windows, the last truncated on short docs; an empty
  * token array hashes one empty window.
  */
case class MinHashSig(child: Expression, shingleLen: Int, nHashes: Int)
    extends UnaryExpression {

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if shingleLen >= 1 && nHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, shingleLen >= 1, nHashes >= 1")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], shingleLen, nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.MinHashSig.compute($c, $shingleLen, $nHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val Space = ' '.toByte

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry for both interpreted eval and generated code. */
  def compute(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val len = tokens.numElements()
    val m = math.max(len - (n - 1), 1)
    val md = digests.get()
    val dig = new Array[Byte](16)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < n && i + j < len) {
        if (j > 0) md.update(Space)
        md.update(tokens.getUTF8String(i + j).getBytes)
        j += 1
      }
      // len == 0 digests the empty window, matching WordShingles'
      // EMPTY_UTF8 placeholder
      md.digest(dig, 0, 16)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      val base = (h >>> 4) % MinHashP // top 15 hex nibbles = portableHash
      var s = 0
      while (s < k) {
        val v = (base * (2 * s + 1) + MinHashMix * s) % MinHashP
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](k)
    i = 0
    while (i < k) { out(i) = Long.box(mins(i)); i += 1 }
    new GenericArrayData(out)
  }
}
