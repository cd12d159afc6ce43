package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT per-group discrete quantiles WITHOUT sorting the corpus —
  * histogram-guided rank selection (the classic two-phase distributed
  * percentile: one binning pass narrows each target rank to a single
  * value range, then only that range's rows are sorted).
  *
  * The naive exact plan (`row_number().over(Window.partitionBy(g))`)
  * makes ONE reducer sort EVERY value of its group — with a 3-value
  * group key that is three reducers sorting the whole fact table, the
  * slowest operator of the round-6 100× sweep (60.8 s). This plan
  * instead:
  *
  *   1. exact (lo, hi, n) per group — order-free aggregates;
  *   2. bin counts per group (B fixed bins over [lo, hi], the
  *      HistogramSketch binning): the shuffle carries ≤ B counter
  *      rows per group, map-side combined. A prefix sum over those
  *      ≤ B rows locates, for each probability p, the single bin
  *      containing rank ceil(p·n) and the exact count of values
  *      below that bin;
  *   3. ONLY the rows landing in a target bin (≈ n/B per target)
  *      are re-scanned and ranked within (group, p) — the window
  *      sort runs over ~|ps|·n/B rows instead of n — and the row at
  *      in-bin rank ceil(p·n) − below is the exact answer.
  *
  * The result is IDENTICAL to the full-sort plan (the value at
  * sorted position ceil(p·n) is unique as a value even under ties:
  * equal values are adjacent in any valid order), so the
  * percentile_disc oracle applies unchanged. Degenerate skew — a
  * group whose values are all equal — collapses to one bin and
  * re-sorts that group in a single reducer, but every row of such a
  * bin carries the same value, so correctness never depends on it.
  *
  * Two corpus scans (stats+bins fused per scan via the barrier'd
  * stats frame) + one ~n/B candidate sort vs one corpus-wide
  * 3-reducer sort: at 100 TB the former is bounded by scan
  * throughput, the latter by a handful of reducers' spill.
  */
object ExactQuantiles {

  val B = 256

  /** Exact discrete quantiles of `valCol` per `groupCols` at
    * probabilities `ps`: output groupCols ++ one column per p (the
    * value at sorted position ceil(p·n), percentile_disc semantics),
    * named by the `ps` keys.
    */
  def quantiles(df: DataFrame, groupCols: Seq[String], valCol: Column,
      ps: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    val stats = graft.Barrier.checkpoint(df.groupBy(gcols: _*)
      .agg(min(valCol).as("_lo"), max(valCol).as("_hi"), count(lit(1)).as("n")))
    // same bin expression in the count pass and the candidate pass —
    // a row's bin is a pure function of (value, lo, hi), so the two
    // scans can never disagree
    val bin = when(col("_hi") === col("_lo"), lit(0L))
      .otherwise(least(
        floor((valCol - col("_lo")) * lit(B.toDouble) / (col("_hi") - col("_lo"))),
        lit((B - 1).toLong)).cast("long"))
    val binned = df.join(broadcast(stats), groupCols)
      .select(gcols :+ bin.as("_bin"): _*)
      .groupBy(gcols :+ col("_bin"): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("_bin"))
    val cum = binned.withColumn("_cum", sum(col("_c")).over(w))
      .join(broadcast(stats), groupCols)
    // per p: the FIRST bin whose cumulative count reaches the target
    // rank, carrying the count strictly below it (min over a struct
    // keyed by bin picks the lowest qualifying bin deterministically)
    val sels = ps.map { case (name, p) =>
      min(when(col("_cum") >= ceil(lit(p) * col("n")),
        struct(col("_bin"), (col("_cum") - col("_c")).as("_below")))).as(s"_t_$name")
    }
    val picked = cum.groupBy(gcols: _*)
      .agg(sels.head, sels.tail: _*)
      .join(broadcast(stats), groupCols)
    // one target row per (group, p): its bin and the in-bin rank
    val targets = picked.select(gcols :+ explode(array(ps.map { case (name, p) =>
        struct(lit(name).as("_name"),
          col(s"_t_$name._bin").as("_bin"),
          (ceil(lit(p) * col("n")).cast("long") - col(s"_t_$name._below")).as("_off"))
      }: _*)).as("_t"): _*)
      .select(gcols ++ Seq(col("_t._name").as("_name"),
        col("_t._bin").as("_bin"), col("_t._off").as("_off")): _*)
    // candidate rows = rows whose bin is some p's target bin; the
    // window partitions by (group, p) so each target ranks ~n/B rows
    val cand = df.join(broadcast(stats), groupCols)
      .select(gcols :+ valCol.as("_v") :+ bin.as("_bin"): _*)
      .join(broadcast(targets), groupCols :+ "_bin")
    val cw = Window.partitionBy(gcols :+ col("_name"): _*).orderBy(col("_v"))
    val hit = cand.withColumn("_rk", row_number().over(cw))
      .filter(col("_rk") === col("_off"))
    hit.groupBy(gcols: _*)
      .agg(ps.map { case (name, _) =>
        max(when(col("_name") === name, col("_v"))).as(name)
      }.head, ps.tail.map { case (name, _) =>
        max(when(col("_name") === name, col("_v"))).as(name)
      }: _*)
  }
}
