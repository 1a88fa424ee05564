package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the stream form of DedupOps.exact.
  *
  * Uses `dropDuplicatesWithinWatermark`: state holds one entry per key seen
  * within the watermark horizon and is evicted as the watermark advances —
  * bounded state, unlike plain `dropDuplicates` whose key set grows forever.
  * This is the correct shape for at-least-once ingestion pipelines where
  * retries duplicate records within a bounded lateness window.
  */
object StreamingDedup {

  def dedupByKey(events: DataFrame, idCol: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)
}
