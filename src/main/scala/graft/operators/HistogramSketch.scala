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

  /** Bin of a value under FIXED [lo, hi) bounds, clamped into
    * [0, B-1] — out-of-range stream values land in the edge bins
    * instead of corrupting the frame (a data-derived lo/hi is not
    * stable on an unbounded stream, so the streaming form fixes the
    * bounds at query definition, the way any production streaming
    * histogram does).
    */
  def binFixed(valCol: Column, lo: Double, hi: Double): Column =
    if (hi == lo) lit(0L)
    else greatest(least(
      floor((valCol - lit(lo)) * lit(B.toDouble) / lit(hi - lo)),
      lit((B - 1).toLong)), lit(0L)).cast("long")

  /** The counter frame under fixed bounds — the sketch's mergeable,
    * streaming-native form: (groupCols, _bin, _c), ≤ B rows per
    * group, map-side combined. As a streaming aggregate the state
    * store holds at most B longs per group — O(1) in stream length
    * (exact quantiles would buffer every value forever). Counts are
    * sums (not idempotent): exactly-once aggregation is the
    * delivery contract, as with CmSketch.
    */
  def counters(df: DataFrame, groupCols: Seq[String], valCol: Column,
      lo: Double, hi: Double): DataFrame =
    df.select(groupCols.map(col) :+ binFixed(valCol, lo, hi).as("_bin"): _*)
      .groupBy(groupCols.map(col) :+ col("_bin"): _*)
      .agg(count(lit(1)).as("_c"))

  /** Union two counter frames built under the SAME bounds —
    * elementwise sum (shards, days, or stream micro-batches combine
    * without re-scan; lambda-style batch+stream backfill).
    */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("_bin"): _*)
      .agg(sum(col("_c")).as("_c"))

  /** Quantile estimates from a fixed-bounds counter frame: per group
    * the upper edge of the first bin whose cumulative count reaches
    * ceil(p·n) — error ≤ one bin width, like the data-derived
    * estimator (the group minimum is unknown here, so there is no
    * small-p exact path).
    */
  def quantilesFromCounters(counters: DataFrame, groupCols: Seq[String],
      lo: Double, hi: Double, ps: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("_bin"))
    val cum = counters.withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("n", sum(col("_c")).over(Window.partitionBy(gcols: _*)))
    val sels = ps.map { case (name, p) =>
      min(when(col("_cum") >= ceil(lit(p) * col("n")), col("_bin"))).as(s"_b_$name")
    }
    cum.groupBy(gcols :+ col("n"): _*)
      .agg(sels.head, sels.tail: _*)
      .select(gcols ++ Seq(col("n")) ++ ps.map { case (name, _) =>
        round(lit(lo) +
          (col(s"_b_$name") + lit(1L)) * lit((hi - lo) / B.toDouble), 6).as(name)
      }: _*)
  }

  /** Quantile estimates of `valCol` per `groupCols` at probabilities
    * `ps`: output groupCols ++ (n: long) ++ one round-6 double column
    * per p, named by `names`.
    */
  /** Single-group-column stats frames at or under this row count get
    * their (lo, hi) INLINED into the bin expression as a literal
    * when-chain instead of broadcast-joined into the corpus scan. The
    * join tax is the motivation (round 10, measured at 100×): a
    * broadcast-hash probe on a string key plus the row-at-a-time
    * processing it forces downstream cost ~5 s over a 60M-row scan —
    * 6× the join-free columnar scan+agg. A ≤32-branch chain of
    * short-circuit equality checks over small arithmetic subtrees
    * stays well inside codegen method limits (the ta_langid
    * interpreted-bytecode lesson bounds the chain width) and is
    * arithmetic-identical to the joined form: the SAME column/literal
    * types feed the SAME IEEE op chain, so the oracle is unchanged.
    */
  val MaxInlineGroups = 32

  def quantiles(df: DataFrame, groupCols: Seq[String], valCol: Column,
      ps: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    // the stats frame is consumed three times downstream — barrier it
    // so the corpus is scanned once for stats, not once per reference
    val stats = graft.Barrier.checkpoint(df.groupBy(gcols: _*)
      .agg(min(valCol).as("_lo"), max(valCol).as("_hi"), count(lit(1)).as("n")))
    // bounded probe: up to MaxInlineGroups+1 rows, just enough to
    // know whether the inline path applies
    val inlineRows =
      if (groupCols.size == 1) stats.limit(MaxInlineGroups + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    val binned =
      if (groupCols.size == 1 && inlineRows.length <= MaxInlineGroups
          && inlineRows.nonEmpty) {
        // inline path: literal per-group bounds, join-free columnar scan
        val branches = inlineRows.toSeq.map { r =>
          val cond = col(groupCols.head) <=> lit(r.get(0))
          // degenerate-range check by NUMERIC value, matching the join
          // path's SQL === semantics: boxed equals diverges on
          // lo=-0.0 / hi=0.0 (equals=false, SQL ===true) and would
          // divide by zero here; SQL null===null is null (not
          // degenerate), so nulls fall through to the arithmetic
          // branch exactly as the join path does. NaN needs its own
          // clause: primitive == is false for NaN==NaN while SQL ===
          // treats NaN=NaN as true (an all-NaN group is degenerate on
          // the join path, so it must be here too — round-11 advice)
          val degenerate = r.get(1) != null && r.get(2) != null && {
            val lo = r.get(1).asInstanceOf[Number].doubleValue()
            val hi = r.get(2).asInstanceOf[Number].doubleValue()
            lo == hi || (lo.isNaN && hi.isNaN)
          }
          val b =
            if (degenerate) lit(0L)
            else least(
              floor((valCol - lit(r.get(1))) * lit(B.toDouble)
                / (lit(r.get(2)) - lit(r.get(1)))),
              lit((B - 1).toLong)).cast("long")
          (cond, b)
        }
        val bin = branches.tail
          .foldLeft(when(branches.head._1, branches.head._2)) {
            case (acc, (c, b)) => acc.when(c, b)
          }
        df.select(gcols :+ bin.as("_bin"): _*)
          .groupBy(gcols :+ col("_bin"): _*)
          .agg(count(lit(1)).as("_c"))
      } else {
        // join path: unbounded group cardinality (or composite keys)
        val bin = when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(
            floor((valCol - col("_lo")) * lit(B.toDouble) / (col("_hi") - col("_lo"))),
            lit((B - 1).toLong)).cast("long"))
        df.join(broadcast(stats), groupCols)
          .select(gcols :+ bin.as("_bin"): _*)
          .groupBy(gcols :+ col("_bin"): _*)
          .agg(count(lit(1)).as("_c"))
      }
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
