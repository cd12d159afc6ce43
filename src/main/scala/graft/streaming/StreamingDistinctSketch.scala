package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.HllSketch

/** Streaming distinct-count: the HLL register frame as a running
  * aggregate (s_distinct_sketch).
  *
  * The register form is what makes the sketch streaming-native:
  * `max(rho)` per (group, bucket) is associative and idempotent, so
  * Structured Streaming's state store holds AT MOST M longs per group
  * — O(groups), never O(distinct keys) — and a restart from
  * checkpoint resumes the exact registers. Exact streaming
  * countDistinct would need unbounded state (every key seen); this is
  * the standard trade and the batch twin (q_distinct_sketch, DuckDB
  * hash-checked) pins the arithmetic the stream runs.
  *
  * Emit the register frame in update/complete mode and feed
  * HllSketch.estimate on read (the estimate is a ≤ M-row closed form
  * — cheap enough to run per sink read); or merge the final stream
  * registers with a batch corpus' registers (HllSketch.merge) for
  * lambda-style backfill.
  */
object StreamingDistinctSketch {

  /** Running register frame of `keyCol` per `groupCols` over a
    * streaming DataFrame — the same expression tree as the batch
    * twin's register pass.
    */
  def registersStream(events: DataFrame, groupCols: Seq[String],
      keyCol: String): DataFrame =
    HllSketch.registers(events, groupCols, col(keyCol))
}
