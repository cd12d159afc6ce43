package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Streaming exact dedup for an ingest pipeline: key incoming
  * documents by the md5 of their normalized text and drop duplicates
  * within the watermark horizon (`dropDuplicatesWithinWatermark`
  * keeps state only for the lateness window, so state is bounded by
  * arrival rate × watermark, not by stream history — the property
  * that makes streaming dedup viable at ingest scale).
  *
  * The batch twin is graft.dedup.Dedup.exact; on the same finite
  * input the streamed survivors match the batch survivors' content
  * hashes (StreamingSpec).
  */
object StreamingDedup {

  /** Requires an event-time column `ts` on the stream. */
  def exact(stream: DataFrame, textCol: String, watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("content_hash", md5(normText(col(textCol))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
