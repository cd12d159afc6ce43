package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventWindows

/** s_events_stream (SURVEY §2): the streaming twin of q_events_window
  * must produce the same totals as the batch transform over the same
  * rows once the stream is drained.
  */
class StreamingSpec extends SparkSpecBase {

  test("hourly streaming aggregation matches its batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq(
      ("2024-01-01 10:05:00", "click", 1.0),
      ("2024-01-01 10:15:00", "click", 2.0),
      ("2024-01-01 10:45:00", "view", 3.0),
      ("2024-01-01 11:05:00", "click", 4.0),
      ("2024-01-01 11:55:00", "view", 5.0))
      .map { case (ts, tpe, v) => (Timestamp.valueOf(ts), tpe, v) }

    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows)
    val streamDf = stream.toDF().toDF("ts", "event_type", "value")

    val q = EventWindows.hourlyStream(streamDf)
      .writeStream
      .format("memory")
      .queryName("hourly_out")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly_out")
      .orderBy("hour", "event_type")
      .select("hour", "event_type", "n", "sum_value")
      .collect().toSeq
    val want = EventWindows.hourly(rows.toDF("ts", "event_type", "value"))
      .orderBy("hour", "event_type")
      .collect().toSeq
    assert(got == want)
    assert(got.length == 4) // (10h click, 10h view, 11h click, 11h view)
  }

  test("batch twin matches the q_events_window query shape on testdata") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val viaModule = EventWindows.hourly(events)
      .agg(sum("n")).collect().head.getLong(0)
    assert(viaModule == events.count())
  }
}
