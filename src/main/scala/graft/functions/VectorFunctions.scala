package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` columns.
  *
  * Re-expresses the scoring kernel of the reference's ItemSelector
  * (reference: item_selector.py:9-52 — dot_product / normalize /
  * cosine_similarity / normalized_cosine_similarity). The hot kernels
  * (`dotD`, `l2SqD`) are native Catalyst expressions with `doGenCode`
  * (graft.functions.expr.VectorExpressions) — a tight primitive loop
  * inside WholeStageCodegen; Spark's own higher-order functions are
  * CodegenFallback and run an interpreted lambda per element, ~10×
  * slower on the 64-dim scoring path. Scoring 100 TB of vectors stays
  * a single narrow map stage: no shuffle, no UDF serialization.
  *
  * All arithmetic is double-precision regardless of input element
  * type, matching the reference (Python floats are doubles), with the
  * same left-to-right accumulation order as DuckDB's
  * list_dot_product (SURVEY.md §5 cross-engine determinism).
  */
object VectorFunctions {
  import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
  import graft.functions.expr.{VectorDot, VectorL2Sq}

  /** Dot product in double precision (codegen'd kernel). */
  def dotD(a: Column, b: Column): Column =
    ExpressionUtils.column(
      VectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** L2 norm (reference: item_selector.py:22-39 `normalize`). */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity (reference: item_selector.py:9-20). A
    * zero-norm side scores 0.0 (the standard "no similarity"
    * convention) instead of dividing by zero: the reference raises
    * ZeroDivisionError there, and under ANSI SQL the raw division
    * KILLS the whole query — a single all-cancelling feature-hashed
    * chunk among 10^9 must not take down a corpus scan (the 100×
    * sweep hit exactly that in d_sections). Non-zero inputs are
    * bit-identical to the unguarded form.
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = normD(a) * normD(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotD(a, b) / denom)
  }

  /** Norm-cached cosine (reference: item_selector.py:41-52) — the
    * fast path when norms are precomputed index columns. Zero-norm
    * guard as in [[cosine]].
    */
  def cosinePreNorm(a: Column, na: Column, b: Column, nb: Column): Column = {
    val denom = na * nb
    when(denom === 0.0, lit(0.0)).otherwise(dotD(a, b) / denom)
  }

  /** Unit-normalize a vector column (element-wise divide by norm; a
    * zero vector stays zero).
    */
  def unitD(a: Column): Column = {
    val n = normD(a)
    transform(a, x => when(n === 0.0, lit(0.0)).otherwise(x.cast("double") / n))
  }

  /** Per-group top-k aggregate (graft.functions.expr.TopKAgg): use as
    * `df.groupBy(g).agg(topK(score, id, k))` then posexplode — the
    * map-side-combining replacement for `row_number().over(...) <= k`.
    * Returns array<struct<score,id>> strongest-first, ties by low id.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      graft.functions.expr.TopKAgg(
        ExpressionUtils.expression(score.cast("double")),
        ExpressionUtils.expression(id.cast("long")),
        k).toAggregateExpression())

  /** Squared L2 distance — cheaper than cosine for IVF assignment
    * (codegen'd kernel).
    */
  def l2SqD(a: Column, b: Column): Column =
    ExpressionUtils.column(
      VectorL2Sq(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
