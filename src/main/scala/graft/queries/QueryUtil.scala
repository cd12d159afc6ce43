package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query suite.
  *
  * Determinism contract with the DuckDB oracle (SURVEY.md §5):
  * monetary sums go through exact DECIMAL(28,10) accumulation (fp
  * summation order differs between engines; decimal doesn't), floats
  * are rounded before output, and every query ends in a total order.
  */
object QueryUtil {
  type Q = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(spark, dir, name)

  /** Exact decimal sum of a double expression, emitted as a rounded
    * double — deterministic across engines and partition orders. */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(DecimalType(28, 10))).cast("double"), scale)

  def r6(c: Column): Column = round(c, 6)
}
