package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SORTED DISTINCT 60-bit hashes of a token array's word n-shingles —
  * the set-representation the exact-jaccard verify intersects.
  *
  * Shingle construction is bit-identical to [[WordShingles]] (space-
  * joined window i..i+n-1 for i in 0 until max(len-n+1, 1), last
  * window truncating), and the hash is the SURVEY §5 portable 60-bit
  * value `('0x' || substr(md5(g), 1, 15))::BIGINT` — the top 15 md5
  * hex digits, computed here as the big-endian first 8 digest bytes
  * shifted right 4 (no hex string is ever built).
  *
  * Why hashes instead of the shingle strings: the verify stage
  * intersects one shingle SET per candidate pair, and string sets
  * re-hash every (up-to-~20-char) shingle per pair inside
  * `array_intersect` while the materialized arrays carry the full
  * text bytes through the plan barrier. 60-bit longs are ~3× smaller
  * to materialize and intersect with a branchless merge walk
  * ([[SortedIntersectCount]]) instead of a per-pair hash table. At
  * 2^60 the per-doc collision odds are ~1e-14 — and both engines
  * compute the SAME hashes (the oracle replays this expression), so
  * even a collision is cross-engine deterministic, never drift.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input and n >= 1")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.ShingleHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Static entry for both interpreted eval and generated code. */
  def hashes(tokens: ArrayData, n: Int): GenericArrayData = {
    val len = tokens.numElements()
    val m = math.max(len - (n - 1), 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var s = if (i < len) tokens.getUTF8String(i) else UTF8String.EMPTY_UTF8
      var j = 1
      while (j < n && i + j < len) {
        s = UTF8String.concat(s, WordShingles.Space, tokens.getUTF8String(i + j))
        j += 1
      }
      // top 15 hex digits of md5 = first 8 big-endian bytes >>> 4
      hs(i) = Md5Hash64.hash(s) >>> 4
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted run (shingle sets are DISTINCT)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    val out = new Array[AnyRef](w)
    i = 0
    while (i < w) { out(i) = Long.box(hs(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** |A ∩ B| of two SORTED long arrays — one branch-light merge walk,
  * zero allocation, vs `size(array_intersect(...))`'s per-pair hash
  * table. The pair join evaluates this once per candidate pair, so it
  * is the inner loop of exact-jaccard verification.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<long> inputs")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Static entry for both interpreted eval and generated code. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** POSITIONAL (non-distinct, unsorted) 60-bit hashes of the word
  * n-shingles: out(i) = hash of the window starting at token i — the
  * raw window-hash stream of exact-substring dedup (duplicateSpans /
  * removeDuplicateSpans), where multiplicity carries the per-doc
  * window counts and the array index IS the window start position
  * (posexplode recovers it with no separate shingle column).
  *
  * Same per-window digest loop as [[ShingleHashes]] (values
  * bit-identical to `portableHash(WordShingles(...))`, which the
  * span oracles replay in SQL) minus the sort/dedup — and minus the
  * UTF8String shingle materialization and the md5-hex + base-16-conv
  * expression chain the column formulation paid per window.
  */
case class RawShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def prettyName: String = "raw_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input and n >= 1")
  }

  override def nullSafeEval(input: Any): Any =
    RawShingleHashes.hashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.RawShingleHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RawShingleHashes =
    copy(child = newChild)
}

object RawShingleHashes {

  /** Static entry for both interpreted eval and generated code. */
  def hashes(tokens: ArrayData, n: Int): GenericArrayData = {
    val len = tokens.numElements()
    val m = math.max(len - (n - 1), 1)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      var s = if (i < len) tokens.getUTF8String(i) else UTF8String.EMPTY_UTF8
      var j = 1
      while (j < n && i + j < len) {
        s = UTF8String.concat(s, WordShingles.Space, tokens.getUTF8String(i + j))
        j += 1
      }
      out(i) = Long.box(Md5Hash64.hash(s) >>> 4)
      i += 1
    }
    new GenericArrayData(out)
  }
}
