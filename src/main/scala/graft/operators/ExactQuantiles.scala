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
  *   1. GLOBAL (lo, hi) of the value column — one row, collected to
  *      the driver (bounded by construction), so the bin function
  *      becomes a LITERAL expression;
  *   2. bin counts per group (B fixed bins over the global range):
  *      the shuffle carries ≤ B counter rows per group, map-side
  *      combined. A prefix sum over those ≤ B rows locates, for each
  *      probability p, the single bin containing rank ceil(p·n) and
  *      the exact count of values below that bin (per-group n = the
  *      same frame's total — no second corpus aggregate);
  *   3. ONLY the rows landing in a target bin are re-scanned and
  *      ranked within (group, p) — the window sort runs over
  *      ~|ps|·n/B rows instead of n — and the row at in-bin rank
  *      ceil(p·n) − below is the exact answer.
  *
  * WHY GLOBAL BINS (round 10): the earlier formulation computed
  * per-group (lo, hi) and joined the stats frame into BOTH corpus
  * passes. The join itself was the cost: a broadcast-hash probe on a
  * string group key plus the row-at-a-time processing it forces
  * downstream measured ~5 s per pass over 60M rows — 6× the whole
  * join-free columnar scan+agg (0.9 s). Binning on the global range
  * keeps every corpus pass join-free and inside the vectorized
  * columnar pipeline. The trade: a group spanning a narrow slice of
  * the global range lands in fewer effective bins, so its candidate
  * set grows by ~(global range / group range); the two-stage
  * candidate filter below keeps that graceful — over-selected rows
  * pay one broadcast probe, never the sort.
  *
  * Candidate selection is two-stage: a codegen'd `IN` over the
  * distinct target BIN VALUES (≤ B ints by construction — the
  * driver-side collect is bounded at B regardless of group count)
  * prunes the corpus scan while it is still columnar; the exact
  * per-(group, bin) broadcast join then runs over the survivors
  * only, so the per-row probe tax is paid by ~candidates, not by the
  * corpus.
  *
  * The result is IDENTICAL to the full-sort plan for ANY bin
  * function shared by the two passes (the value at sorted position
  * ceil(p·n) is unique as a value even under ties: equal values are
  * adjacent in any valid order; bins only LOCATE candidate rows), so
  * the percentile_disc oracle applies unchanged. Degenerate skew — a
  * group whose values all share one bin — re-sorts that group's bin
  * in a single reducer, the bounded worst case the old plan had too.
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
    // pass 1: global value range — ONE row (bounded driver collect)
    val g = df.agg(min(valCol).as("_lo"), max(valCol).as("_hi")).head()
    // bin as a LITERAL function of the value: shared by the count
    // pass and the candidate pass, so the two scans can never
    // disagree; double arithmetic is fine — any deterministic shared
    // binning is correct (see scaladoc)
    val bin =
      if (g.isNullAt(0) || g.get(0) == g.get(1)) lit(0L)
      else {
        val lo = lit(g.get(0)).cast("double")
        val hi = lit(g.get(1)).cast("double")
        least(floor((valCol.cast("double") - lo) * lit(B.toDouble) / (hi - lo)),
          lit((B - 1).toLong)).cast("long")
      }
    // pass 2: per-(group, bin) counts; per-group n is the same
    // frame's total. Barriered: the target-bin collect and the
    // candidate join both read it (≤ groups × B narrow rows).
    val binned = df.select(gcols :+ bin.as("_bin"): _*)
      .groupBy(gcols :+ col("_bin"): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("_bin"))
    val wAll = Window.partitionBy(gcols: _*)
    val cum = binned.withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("n", sum(col("_c")).over(wAll))
    // per p: the FIRST bin whose cumulative count reaches the target
    // rank, carrying the count strictly below it (min over a struct
    // keyed by bin picks the lowest qualifying bin deterministically)
    val sels = ps.map { case (name, p) =>
      min(when(col("_cum") >= ceil(lit(p) * col("n")),
        struct(col("_bin"), (col("_cum") - col("_c")).as("_below")))).as(s"_t_$name")
    }
    val picked = cum.groupBy(gcols: _*)
      .agg(max(col("n")).as("n"), sels: _*)
    // one target row per (group, p): its bin and the in-bin rank
    val targets = graft.Barrier.checkpoint(
      picked.select(gcols :+ explode(array(ps.map { case (name, p) =>
          struct(lit(name).as("_name"),
            col(s"_t_$name._bin").as("_bin"),
            (ceil(lit(p) * col("n")).cast("long") - col(s"_t_$name._below")).as("_off"))
        }: _*)).as("_t"): _*)
        .select(gcols ++ Seq(col("_t._name").as("_name"),
          col("_t._bin").as("_bin"), col("_t._off").as("_off")): _*))
    // ≤ B distinct ints no matter how many groups exist — the
    // columnar IN prune below is bounded by construction
    val targetBins = targets.select(col("_bin")).distinct()
      .collect().map(_.getLong(0)).sorted
    // pass 3: candidate rows. Stage 1 prunes on bin value alone
    // (codegen'd IN, still columnar, no join); stage 2 applies the
    // exact (group, bin) targets to the survivors. The window
    // partitions by (group, p) so each target ranks ~n/B rows.
    val cand = df.select(gcols :+ valCol.as("_v") :+ bin.as("_bin"): _*)
      .filter(col("_bin").isin(targetBins: _*))
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
