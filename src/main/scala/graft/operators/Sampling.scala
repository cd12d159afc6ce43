package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.portableHash

/** Deterministic sampling for training-data pipelines.
  *
  * Hash-based sampling (keep iff hash(id) mod M < rate·M) is the
  * scalable form of "random" subsampling: no RNG state, no shuffle,
  * reproducible across runs/engines (md5-portable, SURVEY.md §5),
  * stable under repartitioning, and composable — the same row set is
  * kept no matter how the data is split across executors. Stratified
  * rates implement per-source/per-language mixing ratios (the "data
  * recipe" of a pretraining corpus).
  */
object Sampling {

  private val M = 1000000L

  /** Keep ~`rate` of rows, decided by the row's id hash. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(sampleHash(col(idCol)) < (rate * M).toLong)

  /** Per-stratum rates; strata absent from the map get `defaultRate`. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * M).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * M).toLong)).otherwise(acc)
    }
    df.filter(sampleHash(col(idCol)) < threshold)
  }

  /** The sampling hash: uniform in [0, M). */
  def sampleHash(id: Column): Column =
    pmod(portableHash(id.cast("string")), lit(M))
}
