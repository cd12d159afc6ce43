package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` columns.
  *
  * Re-expresses the scoring kernel of the reference's ItemSelector
  * (reference: item_selector.py:9-52 — dot_product / normalize /
  * cosine_similarity / normalized_cosine_similarity) as codegen'd
  * Catalyst higher-order functions: `zip_with` + `aggregate` stay
  * inside WholeStageCodegen, so scoring 100 TB of vectors is a single
  * narrow map stage with no shuffle and no UDF serialization.
  *
  * All arithmetic is double-precision regardless of input element
  * type, matching the reference (Python floats are doubles).
  */
object VectorFunctions {

  /** Dot product in double precision. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm (reference: item_selector.py:22-39 `normalize`). */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity (reference: item_selector.py:9-20). */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (normD(a) * normD(b))

  /** Norm-cached cosine (reference: item_selector.py:41-52) — the
    * fast path when norms are precomputed index columns.
    */
  def cosinePreNorm(a: Column, na: Column, b: Column, nb: Column): Column =
    dotD(a, b) / (na * nb)

  /** Unit-normalize a vector column (element-wise divide by norm). */
  def unitD(a: Column): Column = {
    val n = normD(a)
    transform(a, x => x.cast("double") / n)
  }

  /** Squared L2 distance — cheaper than cosine for IVF assignment. */
  def l2SqD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)
}
