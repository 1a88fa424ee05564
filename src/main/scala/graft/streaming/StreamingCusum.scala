package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.EvalOps.cusumChangepoint]]: keep
  * the per-period revenue sums incrementally and locate the CUSUM
  * mean-shift changepoint off that state at any time — the live "did the
  * ingest volume/revenue step to a new level?" gauge.
  *
  * The state is the minimal sufficient statistic: one `(k, xs)` row per
  * calendar period, a plain keyed SUM — associative and commutative, so
  * micro-batch order is irrelevant and two states merge by adding
  * (the same mergeability argument as the reference's histogram fold,
  * compute_histogram/main.py:244-245). Bounded by the calendar grain, not
  * the stream: a year of days is ≤ 366 rows no matter how many events
  * flow. The readout ([[graft.operators.EvalOps.cusumFromSums]]) is a
  * pure function of the state — integer D_t = n·P_t − t·T argmax, windows
  * over the bounded period relation only — so stream and batch answers
  * are equal BY CONSTRUCTION, pinned in `StreamingCusumSpec`.
  */
object StreamingCusum {

  /** The incremental state: per-period sums of an integer-quantized
    * value. `values` needs a period column `k` (any orderable calendar
    * grain) and a BIGINT `x` (quantize currency to cents upstream); the
    * same expression tree runs batch or streaming (complete/update mode).
    */
  def periodSums(values: DataFrame): DataFrame =
    values.groupBy(col("k")).agg(sum(col("x")).as("xs"))

  /** One-row changepoint readout from a `(k, xs)` state relation:
    * `(n_periods, cp_key, cp_index, cusum, mean_before, mean_after,
    * shift)` — empty until the state holds at least two periods.
    */
  def changepointFromState(state: DataFrame): DataFrame =
    graft.operators.EvalOps.cusumFromSums(state)

  /** Autocorrelation readout (lags 1..maxLag) from the SAME `(k, xs)`
    * state — one incremental aggregation serves both the level-shift and
    * the memory monitor.
    */
  def acfFromState(state: DataFrame, maxLag: Int = 7): DataFrame =
    graft.operators.EvalOps.acfFromSums(state, maxLag)
}
