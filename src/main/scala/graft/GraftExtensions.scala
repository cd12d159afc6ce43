package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr.{TopKAgg, VectorDot, VectorL2Sq, WordShingles}

/** SQL surface for graft's native expressions.
  *
  * Two ways in:
  *  - config: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (injected at session build — the standard extension point);
  *  - runtime: `GraftExtensions.register(spark)` on an existing
  *    session (used by tests and notebook sessions).
  *
  * Registered functions: `vector_dot(a, b)`, `vector_l2sq(a, b)`,
  * `word_shingles(tokens, n)`, `topk(score, id, k)` — the same
  * kernels the DataFrame API uses, so `spark.sql("...")` queries get
  * identical plans and identical cross-engine determinism.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private[graft] val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vector_dot",
      new ExpressionInfo(classOf[VectorDot].getName, null, "vector_dot"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))),
    ("vector_l2sq",
      new ExpressionInfo(classOf[VectorL2Sq].getName, null, "vector_l2sq"),
      (es: Seq[Expression]) => VectorL2Sq(es(0), es(1))),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, null, "word_shingles"),
      (es: Seq[Expression]) => WordShingles(es(0), foldableInt(es(1), "word_shingles n"))),
    ("topk",
      new ExpressionInfo(classOf[TopKAgg].getName, null, "topk"),
      (es: Seq[Expression]) =>
        TopKAgg(es(0), es(1), foldableInt(es(2), "topk k")).toAggregateExpression()))

  private def foldableInt(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"$what must be a literal int, got $other")
  }

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
