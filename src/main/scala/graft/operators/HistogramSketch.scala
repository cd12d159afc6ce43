package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram quantile sketch — the bounded-memory scale
  * path for `q_quantiles`' exact window sort (the same role
  * `approx_percentile`'s t-digest plays, rebuilt from engine-portable
  * pieces so the DuckDB oracle replays every bit — SURVEY §5; t-digest
  * centroids are float-order-dependent and cannot be value-checked
  * across engines).
  *
  * Shape: one exact (min, max, count) aggregate per group, then one
  * binning pass whose shuffle carries at most `B` counter rows per
  * group — each value maps to `floor((x-lo)·B/(hi-lo))` — and the
  * quantile is the upper edge of the first bin whose cumulative count
  * reaches ceil(p·n). The exact path ships and sorts EVERY value;
  * this ships B counters, map-side combined, and the window runs over
  * ≤ B rows per group. Worst-case error is one bin width
  * ((hi-lo)/B); B is the accuracy dial.
  *
  * Determinism: min/max/count are order-free; the bin expression and
  * the edge reconstruction `lo + (bin+1)·(hi-lo)/B` use one fixed
  * association order (both engines run the identical IEEE op chain);
  * cumulative selection is integer arithmetic. A one-value group
  * (hi = lo) would divide by zero — it pins to bin 0, whose upper
  * edge reconstructs to exactly `lo`.
  */
object HistogramSketch {

  val B = 256

  /** Quantile estimates of `valCol` per `groupCols` at probabilities
    * `ps`: output groupCols ++ (n: long) ++ one round-6 double column
    * per p, named by `names`.
    */
  def quantiles(df: DataFrame, groupCols: Seq[String], valCol: Column,
      ps: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    // the stats frame is joined three times downstream — barrier it so
    // the corpus is scanned once for stats, not once per reference
    val stats = graft.Barrier.checkpoint(df.groupBy(gcols: _*)
      .agg(min(valCol).as("_lo"), max(valCol).as("_hi"), count(lit(1)).as("n")))
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
    val sels = ps.map { case (name, p) =>
      min(when(col("_cum") >= ceil(lit(p) * col("n")), col("_bin"))).as(s"_b_$name")
    }
    val picked = cum.groupBy(gcols: _*)
      .agg(sels.head, sels.tail: _*)
      .join(broadcast(stats), groupCols)
    // A quantile normally reports its bin's UPPER edge (bias ≤ one bin
    // width high). For p small enough that the target rank is the
    // group minimum (ceil(p·n) ≤ 1, including p = 0) the exact answer
    // is known — return _lo directly instead of lo + binWidth.
    picked.select(gcols ++ Seq(col("n")) ++ ps.map { case (name, p) =>
      when(ceil(lit(p) * col("n")) <= 1, round(col("_lo"), 6))
        .otherwise(round(col("_lo") +
          (col(s"_b_$name") + lit(1L)) * (col("_hi") - col("_lo")) / lit(B.toDouble),
          6)).as(name)
    }: _*)
  }
}
