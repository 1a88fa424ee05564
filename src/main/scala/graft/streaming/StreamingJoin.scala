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

  /** Stream-static enrichment: attach dimension attributes to a stream by
    * key. The static side is a plain (bounded) DataFrame — Spark plans it
    * as a broadcast hash join probed per micro-batch, so the stream never
    * shuffles and NO join state accumulates (the scale contrast to a
    * stream-stream join: dimension lookups should always take this path,
    * not a watermarked join). Left join keeps stream rows with no
    * dimension match (`dim` columns null) — dropping events because a dim
    * is late-loaded is never acceptable in a pipeline.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left")
}
