package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.HistogramSketch

/** Streaming per-group quantiles: the fixed-bounds histogram counter
  * frame as a running aggregate (s_quantiles_sketch).
  *
  * The counter form is what makes the sketch streaming-native: a
  * count per (group, bin) under bounds FIXED at query definition —
  * a plain streaming aggregation whose state store holds at most B
  * longs per group, O(1) in stream length (exact streaming quantiles
  * would buffer every value forever). Structured Streaming delivers
  * each record to the aggregate exactly once, so the running counters
  * equal the batch twin's over the same records — like CmSketch's
  * sums (and unlike HLL's idempotent max), counts must not replay.
  *
  * Emit the counter frame in update/complete mode; estimate on read
  * (HistogramSketch.quantilesFromCounters), or HistogramSketch.merge
  * with a batch corpus' counters for lambda-style backfill —
  * elementwise sum, the same algebra shards use.
  */
object StreamingQuantilesSketch {

  /** Running counter frame of `valCol` over a streaming DataFrame —
    * the same expression tree as the batch twin's counter pass.
    */
  def countersStream(events: DataFrame, groupCols: Seq[String],
      valCol: Column, lo: Double, hi: Double): DataFrame =
    HistogramSketch.counters(events, groupCols, valCol, lo, hi)
}
