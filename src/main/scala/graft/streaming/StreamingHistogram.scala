package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.BinSpec
import graft.operators.HistogramOps

/** Streaming histogram (SURVEY §7.6): the same binned aggregation as the
  * batch operator, expressed once and runnable under Structured Streaming.
  *
  * The reference's histogram merge (`_add_histogram`, element-wise add —
  * compute_histogram/main.py:244-245) is associative and commutative, which
  * is exactly the property Structured Streaming's incremental state update
  * needs: per-micro-batch partial counts fold into the state store without
  * re-reading history. The watermark bounds state: windows older than the
  * delay are finalized and evicted.
  *
  * Scale: state size per window is ≤ `hi − lo` bins (bounded, not
  * data-sized) — the same cardinality-reduction-before-state insight as the
  * batch decile pipeline (SURVEY §3.3).
  */
object StreamingHistogram {

  /** Tumbling-window × bin counts. Works identically on a batch or
    * streaming `events(ts: timestamp, value: double)` input.
    *
    * @param watermarkDelay e.g. Some("10 minutes") for streaming; None in
    *                       batch (withWatermark is a no-op in batch, but
    *                       keeping it optional makes intent explicit).
    */
  def windowedCounts(
      events: DataFrame,
      spec: BinSpec,
      windowDuration: String,
      watermarkDelay: Option[String] = None,
      slideDuration: Option[String] = None): DataFrame = {
    val src = watermarkDelay.foldLeft(events)((df, d) => df.withWatermark("ts", d))
    val win = slideDuration match {
      case Some(slide) => window(col("ts"), windowDuration, slide) // sliding
      case None        => window(col("ts"), windowDuration) // tumbling
    }
    src
      .filter(col("value").isNotNull && !isnan(col("value")))
      .select(col("ts"), HistogramOps.quantize(col("value"), spec).as("code"))
      .filter(HistogramOps.inRange(col("code"), spec.lo, spec.hi))
      .select(col("ts"), HistogramOps.clampToLastBin(col("code"), spec.hi).as("bin"))
      .groupBy(win, col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("win_start"),
        col("bin"),
        col("cnt"))
  }
}
