package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst kernels for scalar quantization (the FAISS SQ8
  * shape): per-dimension uint8 codes against a (lo, step) grid.
  *
  * Codes live in ONE BinaryType column — dim bytes per row (4× less
  * I/O than float32, no per-element parquet overhead), read back as
  * `b[d] & 0xFF`. Both kernels run inside WholeStageCodegen as tight
  * primitive loops; the grid (lo/step/query terms) enters as literal
  * double-array children, so the scan stays a narrow projection.
  *
  * Determinism contract (SURVEY.md §5): every float step is the same
  * fixed op sequence left-to-right over d, so DuckDB replays both
  * encode and the ADC fold bit-for-bit:
  *   encode: c_d = step_d == 0 ? 0 : min(255, floor((x_d - lo_d) / step_d))
  *   adc:    acc += (qadj_d - c_d * step_d)²  (qadj precomputed by the
  *           caller as (q_d - lo_d) - 0.5 * step_d, one rounding shape)
  */
abstract class SqKernel extends TernaryExpression {

  protected def arrOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected def genGetVec(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double)$arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  protected def getVecElem(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }
}

/** vec × (lo, step) → dim uint8 codes packed in a byte array. */
case class SqEncode(first: Expression, second: Expression, third: Expression)
    extends SqKernel {

  override def prettyName: String = "sq_encode"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if arrOk(second.dataType) && arrOk(third.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<double>, array<double>)")
  }

  override def nullSafeEval(v: Any, lo: Any, step: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val l = lo.asInstanceOf[ArrayData]
    val s = step.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), l.numElements())
    val out = new Array[Byte](n)
    var d = 0
    while (d < n) {
      val st = s.getDouble(d)
      // clamp BOTH ends: a value below lo (possible when encoding new
      // rows against a persisted stale grid) must floor to code 0, not
      // wrap negative through the byte cast
      val c =
        if (st == 0.0) 0
        else math.max(0.0,
          math.min(255.0, math.floor((getVecElem(first, x, d) - l.getDouble(d)) / st))).toInt
      out(d) = c.toByte
      d += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, step) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val st = ctx.freshName("st")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $lo.numElements());
         |byte[] $out = new byte[$n];
         |for (int $d = 0; $d < $n; $d++) {
         |  double $st = $step.getDouble($d);
         |  int $c = $st == 0.0 ? 0 : (int) java.lang.Math.max(0.0, java.lang.Math.min(255.0,
         |    java.lang.Math.floor((${genGetVec(first, v, d)} - $lo.getDouble($d)) / $st)));
         |  $out[$d] = (byte) $c;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SqEncode = copy(f, s, t)
}

/** codes × (qadj, step) → Σ_d (qadj_d − c_d·step_d)² — the asymmetric
  *-distance fold over the byte codes (the query stays exact; each
  * term is the squared gap to the code's dequantized midpoint).
  */
case class SqAdc(first: Expression, second: Expression, third: Expression)
    extends SqKernel {

  override def prettyName: String = "sq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case BinaryType if arrOk(second.dataType) && arrOk(third.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<double>, array<double>)")
  }

  override def nullSafeEval(codes: Any, qadj: Any, step: Any): Any = {
    val b = codes.asInstanceOf[Array[Byte]]
    val qa = qadj.asInstanceOf[ArrayData]
    val s = step.asInstanceOf[ArrayData]
    val n = math.min(b.length, qa.numElements())
    var acc = 0.0
    var d = 0
    while (d < n) {
      val diff = qa.getDouble(d) - (b(d) & 0xff) * s.getDouble(d)
      acc += diff * diff
      d += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, qadj, step) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = java.lang.Math.min($codes.length, $qadj.numElements());
         |double $acc = 0.0;
         |for (int $d = 0; $d < $n; $d++) {
         |  double $diff = $qadj.getDouble($d) - ($codes[$d] & 0xff) * $step.getDouble($d);
         |  $acc += $diff * $diff;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SqAdc = copy(f, s, t)
}

/** codesA × codesB → Σ_d (cA_d − cB_d)²·step²_d — the SYMMETRIC-
  * distance fold over two byte-code columns (round-14, the coded
  * corpus kNN join's scorer): both sides quantized on the SAME global
  * per-dimension grid, so unlike PQ-SDC there is no codebook table —
  * the distance is the dequantized-gap fold itself, and with 256
  * levels/dim its ordering tracks the exact one closely enough that a
  * single-digit candidate cut loses nothing on the bench corpus
  * (measured — see knn_join_ivfsq).
  *
  * The per-dimension step² factors ride as a PLAIN double[] codegen
  * reference object, not a literal-array child: the first draft's
  * `ArrayData.getDouble` per iteration defeated JIT vectorization and
  * ran the 768-dim probe 2.7× SLOWER than the exact float dot it was
  * replacing (KnnDimProbe round-14 A/B); with a primitive array the
  * hot loop is int-subtract, int-multiply (exact — byte gaps square
  * to ≤ 255², representable exactly in double), one double multiply,
  * one add — left-to-right over d, so a SQL oracle replays it
  * bit-for-bit as ((cA_d − cB_d)·(cA_d − cB_d))·(step_d·step_d)
  * list-folded in d order (each side of the product carries exactly
  * one rounding, same as the kernel).
  */
/** dim uint8 codes (one binary value) packed little-endian into
  * ceil(dim/8) longs: code d sits at byte (d & 7) of word (d >>> 3),
  * zero-padded tail. This is the JOIN-side representation of the SQ
  * codes: UnsafeArrayData.getLong reads elements zero-copy, while a
  * BinaryType column's getBinary allocates and copies the whole byte
  * array on EVERY access — at SDC-join pair counts (~1e8 pairs × 2
  * sides × dim bytes per query at the 100× corpus) those per-pair
  * allocations dominated the candidate stage (measured ~2.7 µs/pair
  * over the packed-long PQ rung's cost on the same join shape). The
  * disk/shuffle density is unchanged: 8 codes per long.
  */
case class SqPack(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "sq_pack"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.sql}")
  }

  override def nullSafeEval(codes: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      SqPack.pack(codes.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.expr.SqPack.pack($c))")

  override protected def withNewChildInternal(newChild: Expression): SqPack =
    copy(child = newChild)
}

object SqPack {
  def pack(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long]((b.length + 7) >>> 3)
    var d = 0
    while (d < b.length) {
      out(d >>> 3) |= (b(d) & 0xffL) << ((d & 7) << 3)
      d += 1
    }
    out
  }
}

case class SqSdc(left: Expression, right: Expression, step2: Array[Double],
    dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "sq_sdc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>) packed codes")
    }

  override def nullSafeEval(codesA: Any, codesB: Any): Any =
    SqSdc.compute(codesA.asInstanceOf[ArrayData],
      codesB.asInstanceOf[ArrayData], step2, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s2 = ctx.addReferenceObj("sqSdcStep2", step2, "double[]")
    nullSafeCodeGen(ctx, ev, (codesA, codesB) =>
      s"${ev.value} = graft.functions.expr.SqSdc.compute($codesA, $codesB, $s2, $dims);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqSdc =
    copy(left = newLeft, right = newRight)

  // content equality over the step² array (the NearestCentroids
  // round-13-advice law) so semanticEquals / subexpression
  // elimination recognize identical kernels
  override def equals(other: Any): Boolean = other match {
    case o: SqSdc =>
      left == o.left && right == o.right && dims == o.dims &&
        java.util.Arrays.equals(step2, o.step2)
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(
    getClass, left, right, Integer.valueOf(dims),
    Integer.valueOf(java.util.Arrays.hashCode(step2)))
}

object SqSdc {

  /** Static entry for interpreted eval and generated code (never name
    * this `eval` — the round-12 codegen-fallback lesson). `dims` is
    * the encoded dimension of the CURRENT grid; both packed columns
    * must hold exactly ceil(dims/8) words — a word-count mismatch
    * means the probe artifact was encoded at a different dim than the
    * member side (grid/corpus drift), and folding a partial distance
    * would be plausible-but-wrong (round-14 advice #2). Fail loudly
    * instead. (Drift WITHIN one 8-code word is not detectable from
    * the packed layout; the guard targets the real drift class —
    * different embedding models, e.g. 64 vs 768 dims.) The
    * step2-length truncation below IS the sdcDims prefix dial; byte
    * extraction is in dimension order, so the prefix fold is
    * bit-identical to the unpacked formulation.
    */
  def compute(a: ArrayData, b: ArrayData, step2: Array[Double],
      dims: Int): Double = {
    val words = (dims + 7) >>> 3
    if (a.numElements() != words || b.numElements() != words)
      throw new IllegalArgumentException(
        s"sq_sdc: packed code length mismatch (${a.numElements()} vs " +
          s"${b.numElements()} words, expected $words for dim $dims) — " +
          "probe artifact and member codes were encoded at different dims")
    var n = dims
    if (n > step2.length) n = step2.length
    var acc = 0.0
    var d = 0
    var wa = 0L
    var wb = 0L
    while (d < n) {
      if ((d & 7) == 0) {
        wa = a.getLong(d >>> 3)
        wb = b.getLong(d >>> 3)
      }
      val sh = (d & 7) << 3
      val di = ((wa >>> sh) & 0xffL).toInt - ((wb >>> sh) & 0xffL).toInt
      acc += (di * di).toDouble * step2(d)
      d += 1
    }
    acc
  }
}
