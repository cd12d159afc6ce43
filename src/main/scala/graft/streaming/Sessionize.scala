package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
final case class Session(
    user_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long, sum_value: Double)
final case class SessionState(
    start: Long, last: Long, n: Long, sum: Double)

/** Gap-based sessionization — the custom-state streaming operator the
  * reference's host model (one Python process, one in-memory list)
  * cannot express. Two twins with identical semantics:
  *
  *  - `batch`: lag() gap-detection + running session ids via window
  *    functions — SQL-expressible, DuckDB-oracle-checked (q_sessionize);
  *  - `stream`: `flatMapGroupsWithState` with event-time timeout —
  *    per-user state is one (start, last, n, sum) tuple, emitted when
  *    the gap or the watermark closes the session. State size is
  *    O(active users), independent of stream length.
  */
object Sessionize {

  /** Batch twin: a session breaks when the gap to the previous event
    * of the same user exceeds `gapMinutes` (ties on ts broken by
    * event_id for determinism).
    */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapped = events
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("_prev")) > gapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gapped
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
          .cast("double"), 2).as("sum_value"))
  }

  /** Streaming twin over a Dataset[SessionEvent]. */
  def stream(events: Dataset[SessionEvent], gapMinutes: Int,
      watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    def micros(t: Timestamp): Long = t.getTime * 1000L
    def toTs(us: Long): Timestamp = new Timestamp(us / 1000L)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, toTs(s.start), toTs(s.last), s.n, s.sum))
          } else {
            val sorted = rows.toVector.sortBy(e => micros(e.ts))
            var closed = Vector.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapMicros =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed :+= Session(userId, toTs(s.start), toTs(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.iterator
          }
      }
  }
}
