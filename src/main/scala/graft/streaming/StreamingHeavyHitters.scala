package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.CmSketch

/** Streaming per-key frequency: the count-min counter frame as a
  * running aggregate (s_heavy_hitters).
  *
  * The counter form is what makes the sketch streaming-native: the
  * grid is a count per (row, position) — a plain streaming
  * aggregation whose state store holds AT MOST D·W longs, O(1) in
  * both stream length and key cardinality (exact streaming per-key
  * counts keep state for every key ever seen). Structured Streaming
  * delivers each record to the aggregate exactly once, so the
  * running counters equal the batch twin's (q_heavy_hitters, DuckDB
  * hash-checked) over the same records — unlike HLL's idempotent
  * max, sums must not be replayed, which the engine's exactly-once
  * aggregation contract guarantees.
  *
  * Emit the counter frame in update/complete mode; estimate on read
  * (CmSketch.estimate against any candidate key set), or
  * CmSketch.merge with a batch corpus' counters for lambda-style
  * backfill — elementwise sum, the same algebra shards use.
  */
object StreamingHeavyHitters {

  /** Running counter frame of `key` over a streaming DataFrame — the
    * same expression tree as the batch twin's counter pass.
    */
  def countersStream(events: DataFrame, key: Column): DataFrame =
    CmSketch.counters(events, key)
}
