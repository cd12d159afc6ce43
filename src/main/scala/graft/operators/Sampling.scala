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

  /** Temperature sampling (the mT5/XLM-R language-balancing recipe):
    * target language share p_l ∝ n_l^alpha, realized as an
    * independent per-doc keep rate q_l = min(1, budgetFrac·N·p_l/n_l)
    * — rare languages are kept (near-)whole, dominant ones are
    * downsampled. The rates are DERIVED from corpus counts in-plan
    * (one tiny groupBy broadcast back — a fixed rate map is the
    * "frozen parameter" trap the AnnTuner work removed from the
    * dedup/ANN family). Thresholds are rounded to integer hash units
    * so the keep decision is cross-engine exact.
    *
    * Determinism: each stratum's tempered weight pow(n, alpha) is
    * quantized to 6 decimals (cast to DECIMAL(38,6)) and the
    * normalizer Z is accumulated in that decimal type — an exact,
    * order-independent sum — so the derived integer thresholds are
    * bit-identical across engines (JVM vs DuckDB libm pow may differ
    * in the last ulp; a double sum is combine-order-dependent under
    * reshuffling — both killed here).
    */
  def temperature(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double, budgetFrac: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
    val powW = pow(col("_n"), alpha).cast("decimal(38,6)")
    val tot = counts.agg(
      sum(powW).as("_zd"), sum(col("_n")).as("_nn"))
    val thresholds = counts.crossJoin(broadcast(tot))
      .withColumn("_thr",
        round(least(lit(1.0),
          lit(budgetFrac) * col("_nn").cast("double") *
            (powW.cast("double") / col("_zd").cast("double")) / col("_n"))
          * M, 0).cast("long"))
      .select(col(strataCol), col("_thr"))
    df.join(broadcast(thresholds), strataCol)
      .filter(sampleHash(col(idCol)) < col("_thr"))
      .drop("_thr")
  }

  /** Deterministic train/val/test split assignment: each row gets the
    * first split whose cumulative hash threshold its id hash falls
    * under (train 0.8 / val 0.1 / test 0.1 → h < 0.8M train,
    * h < 0.9M val, else test). The split hash is SALTED ("split:" key
    * domain) so assignment is independent of every other hash-based
    * decision in the pipeline — an unsalted split would correlate
    * with [[hashSample]]'s keep set (the kept subsample would land
    * entirely in one split's low-hash range), silently biasing any
    * sampled-then-split corpus.
    *
    * Like all hash decisions here: no RNG state, no shuffle (a pure
    * projection), reproducible across runs/engines/partitionings, and
    * STABLE UNDER CORPUS GROWTH — a doc's split never changes when
    * neighbors are added or removed, which is what makes held-out
    * contamination tracking possible across corpus versions.
    */
  def split(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    // a negative fraction would pass the sum check while producing
    // non-monotonic cumulative thresholds (rows silently mis-assigned)
    require(splits.forall(_._2 >= 0),
      s"split fractions must be non-negative, got ${splits.map(_._2)}")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    // withColumn on an existing name silently REPLACES it — refuse
    // rather than eat a caller's column
    require(!df.columns.contains(outCol),
      s"split: input already has a '$outCol' column; pass outCol to rename")
    val h = sampleHash(concat(lit("split:"), col(idCol).cast("string")))
    val cum = splits.scanLeft(0.0) { case (a, (_, f)) => a + f }
      .tail.map(c => math.round(c * M))
    val assigned = splits.map(_._1).zip(cum).init
      .foldRight(lit(splits.last._1): Column) { case ((name, thr), rest) =>
        when(h < thr, lit(name)).otherwise(rest)
      }
    df.withColumn(outCol, assigned)
  }

  /** Per-group token budgeting (the RefinedWeb/Dolma-style domain
    * cap): within each group (source/domain/language), rank rows by
    * quality descending (ties by id ascending, so the cut is total
    * and deterministic) and keep rows while the RUNNING token total
    * — including the current row — stays within `budget`. A row that
    * would push the group over the budget is dropped, as is every
    * lower-ranked row; a single row larger than the whole budget is
    * dropped too (budget means budget).
    *
    * Scale shape: one shuffle on `groupCol`, then a per-group
    * window — the same cost as any per-domain aggregate. Group skew
    * is bounded by the largest domain; at 100 TB domains are the
    * natural partition unit and the window never materializes more
    * than a partition. Output carries `cum_tokens` (the running
    * total at the row) for audit.
    */
  def tokenBudget(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, weightCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_tokens", sum(col(weightCol).cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
  }
}
