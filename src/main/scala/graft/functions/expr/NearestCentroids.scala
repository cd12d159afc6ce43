package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Per-row IVF probe list: the `np` nearest cell ids by squared L2
  * distance, ordered by (distance, cell id) ascending — the plural of
  * [[NearestCentroid]] (assignment is the np = 1 special case, kept
  * separate because its single-best early exit is tighter).
  *
  * This is the batch probe-list builder for corpus×corpus kNN against
  * an IVF layout (knn_join's persisted twin): every corpus vector is
  * a query, so the searchBatch probe stage's crossJoin(centroids) +
  * TopKAgg would materialize n×nlist scored rows and push them
  * through an aggregate — the exact pathology the NearestCentroid
  * scaladoc records (~2 min at the 100× sweep for assignment alone).
  * Here the probe list is a narrow map: one codegen'd scan over the
  * centroid matrix per row, zero extra rows, zero shuffle; the
  * explode to (row, cell) happens AFTER, emitting exactly n×np rows.
  *
  * Same hot-loop properties as NearestCentroid: the row vector is
  * copied once into a primitive buffer, and a centroid is abandoned
  * (blocked partial-distance early exit) as soon as its partial sum
  * exceeds the CURRENT np-th best — the result set is bit-identical
  * to the full scan because a pruned centroid could only have placed
  * ≥ the bound it was pruned against, and ties resolve toward the
  * lowest cell id exactly as the strict `<` insertion keeps earlier
  * (lower-id, centroids held sorted) entries. Distance accumulation
  * is the sequential left-to-right fold of VectorL2Sq / DuckDB's
  * list_distance, so probe picks replay exactly in a SQL oracle
  * (`row_number() OVER (ORDER BY list_distance(v, cv), cell) <= np`).
  */
case class NearestCentroids(
    child: Expression,
    cells: Array[Long],
    centroids: Array[Array[Double]],
    np: Int) extends UnaryExpression {

  require(cells.length == centroids.length && cells.nonEmpty,
    "NearestCentroids needs one id per centroid and at least one centroid")
  require(np >= 1, s"NearestCentroids np must be >= 1, got $np")

  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NearestCentroids.compute(
      v.asInstanceOf[ArrayData],
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType,
      cells, centroids, np)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val ids = ctx.addReferenceObj("cells", cells, "long[]")
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expr.NearestCentroids.compute(" +
        s"$a, $isFloat, $ids, $cents, $np);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  // case-class equality on Array fields compares by REFERENCE, so two
  // semantically identical kernels would never be semanticEquals and
  // Catalyst's subexpression elimination / canonicalization caching
  // silently miss (round-13 advice). Content equality restores that;
  // hashCode must agree.
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroids =>
      child == o.child && np == o.np &&
        java.util.Arrays.equals(cells, o.cells) &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]],
          o.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Integer.valueOf(np),
    Integer.valueOf(java.util.Arrays.hashCode(cells)),
    Integer.valueOf(java.util.Arrays.deepHashCode(
      centroids.asInstanceOf[Array[AnyRef]])))
}

object NearestCentroids {

  /** Static entry for both interpreted eval and generated code (the
    * static must NOT be named `eval`: Scala suppresses the forwarder
    * that clashes with the inherited Expression.eval and Janino then
    * silently falls back to interpreted execution — the round-12
    * codegen-fallback lesson).
    */
  def compute(arr: ArrayData, elemIsFloat: Boolean,
      cells: Array[Long], centroids: Array[Array[Double]], np: Int): ArrayData = {
    var maxCentLen = 0
    var ci = 0
    while (ci < centroids.length) {
      if (centroids(ci).length > maxCentLen) maxCentLen = centroids(ci).length
      ci += 1
    }
    var m = arr.numElements()
    if (m > maxCentLen) m = maxCentLen
    val buf = new Array[Double](m)
    var i = 0
    while (i < m) {
      buf(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val k = math.min(np, centroids.length)
    // bounded insertion list sorted by (distance asc, cell asc); the
    // scan visits centroids in ascending cell order, so a tie with a
    // kept entry (strict `<` fails) correctly keeps the lower id
    val bestD = new Array[Double](k)
    val bestC = new Array[Long](k)
    java.util.Arrays.fill(bestD, Double.PositiveInfinity)
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(cv.length, m)
      val bound = bestD(k - 1) // prune against the CURRENT k-th best
      var acc = 0.0
      i = 0
      var continue = true
      while (continue) {
        val lim = math.min(i + 16, n)
        while (i < lim) {
          val d = buf(i) - cv(i)
          acc += d * d
          i += 1
        }
        if (i >= n || acc >= bound) continue = false
      }
      if (acc < bound) {
        // insert (acc, cell) keeping (distance, cell) order; equal
        // distances never displace an earlier (lower-id) entry
        var p = k - 1
        while (p > 0 && bestD(p - 1) > acc) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = acc
        bestC(p) = cells(c)
      }
      c += 1
    }
    // with finite inputs every slot fills (an unpruned centroid beats
    // +Inf), but a NaN element poisons every accumulation — `acc <
    // bound` is then false for ALL centroids and the bestC defaults
    // (cell id 0) would be emitted as a silently WRONG probe list and
    // persisted into the self-probe artifact (round-13 advice). Emit
    // only the slots actually filled: a non-finite vector gets an
    // empty probe list — explode() drops the row, i.e. "unsearchable",
    // never "probes a bogus cell".
    var filled = 0
    while (filled < k && bestD(filled) < Double.PositiveInfinity) filled += 1
    new GenericArrayData(java.util.Arrays.copyOf(bestC, filled))
  }
}
