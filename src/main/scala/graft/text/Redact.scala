package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction stage of a training-data pipeline.
  * Pure codegen'd regexp_replace chain (no UDF), so a 100 TB scrub
  * pass is a narrow map stage like the rest of the text suite.
  * Patterns are deliberately conservative/simple (emails, bare phone
  * numbers, IPv4, 16-digit card-like runs) and engine-portable (same
  * regex class syntax in Spark's Java regex and DuckDB's RE2).
  */
object Redact {

  val Email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val CardLike = "\\b[0-9]{16}\\b"
  val PhoneLike = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"

  private val rules: Seq[(String, String)] = Seq(
    Email -> "<EMAIL>", Ipv4 -> "<IP>", CardLike -> "<CARD>", PhoneLike -> "<PHONE>")

  def scrub(text: Column): Column =
    rules.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Redacted text + per-rule hit counts (counts feed the usual
    * drop-if-too-much-PII quality gate) — one evaluation of the
    * graft.functions.expr.RedactPii kernel per row instead of the
    * 9-node column formulation (4 replace passes + 4 extract_all
    * passes, each converting and allocating per row; redaction was
    * the heaviest text op at the 100× corpus). Output values are
    * bit-identical: the kernel runs the same java.util.regex fold.
    */
  def scrubWithCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val r = ColumnBridge.column(
      graft.functions.expr.RedactPii(ColumnBridge.expression(col(textCol))))
    docs
      .withColumn("_r", r)
      .withColumn("redacted", col("_r.redacted"))
      .withColumn("n_email", col("_r.n_email"))
      .withColumn("n_ip", col("_r.n_ip"))
      .withColumn("n_card", col("_r.n_card"))
      .withColumn("n_phone", col("_r.n_phone"))
      .drop("_r")
  }
}
