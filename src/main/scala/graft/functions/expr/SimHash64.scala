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
