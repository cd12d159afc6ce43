package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Per-row IVF argmin: the cell id of the nearest centroid by squared
  * L2 distance, ties broken toward the LOWEST cell id (centroids are
  * held sorted by id and the scan keeps the first strict minimum —
  * the same (dist, cell) ordering the DuckDB oracle's window uses).
  *
  * This replaces the crossJoin(broadcast(centroids)) + argmin-
  * aggregate formulation of cell assignment: that plan materializes
  * n×nlist scored rows and pushes them through an aggregate (at 200k
  * vectors × √n centroids the 100× sweep spent ~2 min there); this is
  * a narrow map — one codegen'd double loop per row, zero extra rows,
  * zero shuffle. The centroid matrix is a plan constant referenced via
  * `addReferenceObj` (NOT inlined source), so nlist = 65536 × dim 1024
  * is still just an executor-held array.
  *
  * Distance accumulation is the same sequential left-to-right fold as
  * VectorL2Sq / DuckDB's list_distance, so cell picks are bit-identical
  * across engines (SURVEY.md §5).
  */
case class NearestCentroid(
    child: Expression,
    cells: Array[Long],
    centroids: Array[Array[Double]]) extends UnaryExpression {

  require(cells.length == centroids.length && cells.nonEmpty,
    "NearestCentroid needs one id per centroid and at least one centroid")

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var best = Double.PositiveInfinity
    var bestCell = cells(0)
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(cv.length, arr.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val d = x - cv(i)
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; bestCell = cells(c) }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val ids = ctx.addReferenceObj("cells", cells, "long[]")
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getElem =
        if (elemIsFloat) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |long $bestCell = $ids[0];
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  double[] $cv = $cents[$c];
         |  int $n = java.lang.Math.min($cv.length, $a.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double _d = $getElem - $cv[$i];
         |    $acc += _d * _d;
         |  }
         |  if ($acc < $best) { $best = $acc; $bestCell = $ids[$c]; }
         |}
         |${ev.value} = $bestCell;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
