package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog distinct-count sketch (Flajolet et al. 2007)
  * — the mergeable scale path for `q_distinct`'s exact
  * `count(DISTINCT …)`.
  *
  * Exact distinct shuffles every (group, key) pair; the sketch
  * shuffles at most `M` register rows per group, map-side combined
  * (`max` is associative), so a 100 TB corpus pays one narrow hash
  * pass plus a constant-size aggregate. Registers are also the
  * natural incremental form: unioning two corpora is an elementwise
  * register max, no re-scan.
  *
  * Unlike `approx_count_distinct` (Spark's HLL++ — the right choice
  * when no external engine must reproduce the value), every step here
  * is engine-portable, so the DuckDB oracle replays the sketch
  * bit-for-bit (SURVEY §5):
  *
  *   - hash = md5 of the key rendered as a string; the first 2 hex
  *     digits (mod M) pick the register, the next 13 hex digits are
  *     the 52-bit rank field `w`;
  *   - rho(w) = leading zeros of the 52-bit field + 1
  *            = 53 - bitlength(w)  (w = 0 → 53), computed via
  *     `length(bin(w))` which both engines define identically;
  *   - the harmonic sum Σ 2^-M_j is scaled by 2^53 into EXACT integer
  *     arithmetic (terms are 1L << (53 - M_j) ≤ 2^53; ≤ M terms keeps
  *     the sum < 2^63), so partial-agg combine order cannot change a
  *     bit — the only float op is the final single division;
  *   - the numerator constant alpha·M²·2^53 is computed once here and
  *     embedded in the oracle as its exact decimal rendering, so both
  *     engines divide identical doubles.
  *
  * M = 32 registers (alpha = 0.697) keeps the demo corpus (≥150
  * distinct keys per group) inside the raw-estimator range — the
  * n < 2.5M linear-counting correction needs `ln`, whose last ulp is
  * libm-specific, so it is deliberately out of the oracle-checked
  * path; production use at small n would add it after the sketch.
  * Expected relative error ~1.04/√M ≈ 18% — register count is the
  * accuracy dial (the shuffle stays ~M rows/group either way).
  */
object HllSketch {

  val M = 32
  val Alpha = 0.697

  /** 2^53 — the integer scale of the harmonic sum. */
  val Scale = 9007199254740992L

  /** alpha · M² · 2^53 as a double; `NumeratorLit` is its exact
    * decimal rendering for the SQL oracle (a double→BigDecimal
    * conversion is exact, and parsing it back rounds to the same
    * double in any IEEE engine).
    */
  val Numerator: Double = Alpha * M * M * Scale.toDouble
  val NumeratorLit: String = new java.math.BigDecimal(Numerator).toPlainString

  /** Per-key register coordinates: (bucket, rho). `key` must already
    * be a string (render numerics with cast so the oracle's VARCHAR
    * cast matches).
    */
  def bucket(key: Column): Column =
    conv(substring(md5(key), 1, 2), 16, 10).cast("long") % M

  def rho(key: Column): Column = {
    val w = conv(substring(md5(key), 3, 13), 16, 10).cast("long")
    when(w === 0L, lit(53)).otherwise(lit(53) - length(bin(w))).cast("int")
  }

  /** The register frame — the sketch's MERGEABLE form: groupCols ++
    * (_b: register index, _m: max rho). ≤ M rows per group, max is
    * associative/idempotent, so registers of a corpus union are an
    * elementwise max of per-corpus registers (see merge), registers
    * of a stream are a running max (streaming twin), and incremental
    * ingest never re-scans history.
    */
  def registers(df: DataFrame, groupCols: Seq[String], keyCol: Column): DataFrame = {
    val gcols = groupCols.map(col)
    df.select(gcols :+ bucket(keyCol).as("_b") :+ rho(keyCol).as("_r"): _*)
      .groupBy(gcols :+ col("_b"): _*)
      .agg(max(col("_r")).as("_m"))
  }

  /** Union two register frames (same grouping) — elementwise max. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("_b")): _*)
      .agg(max(col("_m")).as("_m"))

  /** Closed-form estimate from a register frame. Output: groupCols ++
    * (hll_est: double round 4, n_regs_hit: long).
    */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gcols = groupCols.map(col)
    regs
      .groupBy(gcols: _*)
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - _m AS INT))")).as("_s_hit"),
        count(lit(1)).as("n_regs_hit"))
      .select(gcols
        :+ round(lit(Numerator) /
            (col("_s_hit") + (lit(M.toLong) - col("n_regs_hit")) * lit(Scale)).cast("double"),
          4).as("hll_est")
        :+ col("n_regs_hit"): _*)
  }

  /** Distinct-count estimate of `keyCol` per `groupCols`: one narrow
    * hash pass, a (group, bucket) max aggregate (≤ M rows per group),
    * then the closed-form estimate. Output: groupCols ++
    * (hll_est: double round 4, n_regs_hit: long).
    */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], keyCol: Column): DataFrame =
    estimate(registers(df, groupCols, keyCol), groupCols)
}
