package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation join: match events of one type to later events
  * of another type by key within a time bound — the funnel/attribution
  * shape (view→click, request→response).
  *
  * Both sides carry watermarks and the join condition bounds the time
  * range, so Spark can evict state: a left row is held only until
  * `maxDelay` past its event time. Without the range condition the state
  * store would grow forever — this is THE scale constraint on
  * stream-stream joins.
  */
object StreamingJoin {

  /** Inner-join `left` (e.g. views) to `right` (e.g. clicks) on `keyCol`,
    * keeping pairs where the right event lands in
    * `(left.ts, left.ts + maxDelay]`. Inputs need `ts: timestamp`,
    * `keyCol`, and disjoint other column names.
    */
  def correlate(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      watermark: String,
      maxDelay: String): DataFrame = {
    val l = left.withWatermark("ts", watermark).withColumnRenamed("ts", "l_ts")
    val r = right.withWatermark("ts", watermark).withColumnRenamed("ts", "r_ts")
    l.join(
      r,
      l(keyCol) === r(keyCol) &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxDelay"),
      "inner")
      .drop(r(keyCol))
  }
}
