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
  * Two hot-loop properties matter at √n×dim work per row:
  *   - the row vector is copied ONCE into a reused primitive buffer —
  *     ArrayData element reads are per-call accessor work (null/offset
  *     bookkeeping on an UnsafeArrayData), and the naive loop re-pays
  *     them nlist times per element; the nlist distance passes here
  *     run over plain double[] (JIT-vectorizable);
  *   - blocked partial-distance early exit (the standard exhaustive-
  *     assignment pruning, e.g. FAISS's exhaustive_L2sqr_seq): a
  *     centroid is abandoned as soon as its PARTIAL sum exceeds the
  *     current best. The argmin decision is unchanged — the partial
  *     sum is monotone nondecreasing, so a skipped centroid's full
  *     distance could only have been ≥ best, and the keep test is
  *     strict (`< best`) with ties already resolved to the earliest
  *     (lowest) cell id. Results are bit-identical to the full scan.
  *
  * `offset` starts the distance fold at that element of the input
  * vector (length = the centroid's length): PQ's per-subspace encode
  * passes the FULL vector with offset s·subDim instead of slicing —
  * `slice()` allocates a fresh ArrayData per row per subspace.
  *
  * Distance accumulation is the same sequential left-to-right fold as
  * VectorL2Sq / DuckDB's list_distance, so cell picks are bit-identical
  * across engines (SURVEY.md §5).
  *
  * PRECONDITION: finite inputs. A NaN element poisons every distance
  * accumulation, every `acc < best` test fails, and the result is the
  * documented fallback `cells(0)` — the same row would also break the
  * SQL oracle's list_distance ordering, so assignment of non-finite
  * vectors is undefined behavior by contract; filter them at ingest
  * (the plural NearestCentroids emits an empty probe list instead,
  * because its output is PERSISTED into the self-probe artifact).
  */
case class NearestCentroid(
    child: Expression,
    cells: Array[Long],
    centroids: Array[Array[Double]],
    offset: Int = 0) extends UnaryExpression {

  require(cells.length == centroids.length && cells.nonEmpty,
    "NearestCentroid needs one id per centroid and at least one centroid")
  require(offset >= 0, s"NearestCentroid offset must be >= 0, got $offset")

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val maxCentLen: Int = centroids.map(_.length).max

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var m = arr.numElements() - offset
    if (m < 0) m = 0
    if (m > maxCentLen) m = maxCentLen
    val buf = new Array[Double](m)
    var i = 0
    while (i < m) {
      buf(i) = if (elemIsFloat) arr.getFloat(offset + i).toDouble
               else arr.getDouble(offset + i)
      i += 1
    }
    var best = Double.PositiveInfinity
    var bestCell = cells(0)
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(cv.length, m)
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
        if (i >= n || acc >= best) continue = false
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
      val buf = ctx.addMutableState("double[]", "ncBuf", v => s"$v = null;")
      val m = ctx.freshName("m")
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val lim = ctx.freshName("lim")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val getElem =
        if (elemIsFloat) s"(double)$a.getFloat($offset + $i)"
        else s"$a.getDouble($offset + $i)"
      s"""
         |int $m = $a.numElements() - $offset;
         |if ($m < 0) $m = 0;
         |if ($m > $maxCentLen) $m = $maxCentLen;
         |if ($buf == null || $buf.length < $m) $buf = new double[$m];
         |for (int $i = 0; $i < $m; $i++) $buf[$i] = $getElem;
         |double $best = Double.POSITIVE_INFINITY;
         |long $bestCell = $ids[0];
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  double[] $cv = $cents[$c];
         |  int $n = java.lang.Math.min($cv.length, $m);
         |  double $acc = 0.0;
         |  int $i = 0;
         |  while (true) {
         |    int $lim = ($i + 16 < $n) ? $i + 16 : $n;
         |    for (; $i < $lim; $i++) {
         |      double $d = $buf[$i] - $cv[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($i >= $n || $acc >= $best) break;
         |  }
         |  if ($acc < $best) { $best = $acc; $bestCell = $ids[$c]; }
         |}
         |${ev.value} = $bestCell;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  // content equality over the Array fields (reference-compared by the
  // generated case-class equals) so Catalyst semanticEquals /
  // subexpression elimination can recognize identical kernels — the
  // same round-13-advice fix as NearestCentroids.
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroid =>
      child == o.child && offset == o.offset &&
        java.util.Arrays.equals(cells, o.cells) &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]],
          o.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Integer.valueOf(offset),
    Integer.valueOf(java.util.Arrays.hashCode(cells)),
    Integer.valueOf(java.util.Arrays.deepHashCode(
      centroids.asInstanceOf[Array[AnyRef]])))
}
