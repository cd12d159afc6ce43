package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Symmetric-distance PQ scoring (Jégou et al. 2011 §III.B, SDC):
  * approximate ||x − y||² from the two vectors' CODES alone as
  * Σ_s lut(s)(codeX_s · K + codeY_s), where lut(s) is the
  * codeword-to-codeword squared-L2 table of subspace s — a tiny
  * (nSub × K × K doubles) driver-side constant attached as a codegen
  * reference object.
  *
  * This is the kernel that lets a corpus×corpus candidate join carry
  * EIGHT BYTES per side instead of dim×4 float bytes (the round-13
  * scale note on knnJoinSelf: the probe side's np-replicated float
  * vectors dominated the shuffle): the nSub ≤ 8 byte-sized codes are
  * PACKED into one long (code s at bit 8s — plain shiftleft/or
  * arithmetic on the build side), and per candidate pair the score is
  * nSub shift-mask-lookups + an add chain — no vector arithmetic.
  * SDC requires BOTH sides coded against the SAME (flat, non-residual)
  * codebooks: residual codes live in per-cell coordinate frames and
  * cannot be compared across a probe pair's two different member
  * cells, which is why the coded knn join composes IVF coarse
  * blocking with FLAT PQ codes rather than IvfPqIndex's residual ones.
  *
  * Determinism contract (SURVEY §5): each lut entry is the same
  * left-to-right squared-L2 fold as NearestCentroid / DuckDB's
  * list_reduce over the two codewords, and the add chain runs in
  * subspace order — an SQL oracle replays scores bit-for-bit from the
  * replayed-fit codebooks (a per-subspace flattened d² list indexed
  * ca·K + cb, summed in subspace order).
  *
  * Emits +Inf for a code outside [0, K) rather than throwing — an
  * impossible value under the fit contract (K ≤ 256 is required so
  * every code fits its byte), kept total so a corrupt codes row can
  * never kill a corpus join (it just never wins a heap slot).
  */
case class PqSdc(
    left: Expression,
    right: Expression,
    lut: Array[Array[Double]],
    k: Int) extends BinaryExpression {

  require(lut.nonEmpty && lut.length <= 8,
    s"PqSdc packs codes into one long — nSub must be in [1, 8], got ${lut.length}")
  require(k >= 1 && k <= 256,
    s"PqSdc packs byte-sized codes — K must be in [1, 256], got $k")
  require(lut.forall(_.length == k * k),
    s"PqSdc needs nSub K×K tables (K=$k)")

  override def prettyName: String = "pq_sdc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two packed-code bigint columns, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqSdc.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], lut, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tabs = ctx.addReferenceObj("sdcLut", lut, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expr.PqSdc.compute($a, $b, $tabs, $k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqSdc =
    copy(left = newLeft, right = newRight)

  // content equality over the lut array (the NearestCentroids
  // round-13-advice fix applied from the start) so semanticEquals /
  // subexpression elimination recognize identical kernels
  override def equals(other: Any): Boolean = other match {
    case o: PqSdc =>
      left == o.left && right == o.right && k == o.k &&
        java.util.Arrays.deepEquals(
          lut.asInstanceOf[Array[AnyRef]], o.lut.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(
    getClass, left, right, Integer.valueOf(k),
    Integer.valueOf(java.util.Arrays.deepHashCode(
      lut.asInstanceOf[Array[AnyRef]])))
}

object PqSdc {

  /** Static entry for interpreted eval and generated code (never name
    * this `eval` — the round-12 codegen-fallback lesson).
    */
  def compute(a: Long, b: Long, lut: Array[Array[Double]], k: Int): Double = {
    var acc = 0.0
    var s = 0
    while (s < lut.length) {
      val ca = ((a >>> (8 * s)) & 0xFFL).toInt
      val cb = ((b >>> (8 * s)) & 0xFFL).toInt
      if (ca >= k || cb >= k) return Double.PositiveInfinity
      acc += lut(s)(ca * k + cb)
      s += 1
    }
    acc
  }
}
