package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation, batch and streaming twins.
  *
  * The same transform body serves both `spark.read` (the batch
  * q_events_window query) and `spark.readStream` (Structured
  * Streaming): that symmetry is the point — the engine's streaming
  * path IS its batch path plus a watermark, so correctness of the
  * batch twin (DuckDB-checked) carries over to the stream.
  *
  * At scale: tumbling-window groupBy shuffles on (window, event_type);
  * with a watermark the state store evicts windows older than the
  * lateness bound, so state is O(active windows × types), not O(data).
  */
object EventWindows {

  /** Tumbling 1h window totals per event type. `events` must have
    * (ts: timestamp, event_type: string, value: double).
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming twin with a watermark; append-mode capable. */
  def hourlyStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    hourly(events.withWatermark("ts", watermark))
}
