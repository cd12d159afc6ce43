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
    * drop-if-too-much-PII quality gate).
    */
  def scrubWithCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("redacted", scrub(col(textCol)))
      .withColumn("n_email", size(regexp_extract_all(col(textCol), lit(Email), lit(0))).cast("long"))
      .withColumn("n_ip", size(regexp_extract_all(col(textCol), lit(Ipv4), lit(0))).cast("long"))
      .withColumn("n_card", size(regexp_extract_all(col(textCol), lit(CardLike), lit(0))).cast("long"))
      .withColumn("n_phone", size(regexp_extract_all(col(textCol), lit(PhoneLike), lit(0))).cast("long"))
}
