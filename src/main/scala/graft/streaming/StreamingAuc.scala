package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.BinSpec

/** Streaming twin of [[graft.operators.EvalOps.binnedAuc]]: maintain the
  * class-split histogram state incrementally and read the AUC off it at any
  * time — the live "is the quality score still separating?" gauge a
  * training-data pipeline keeps over its ingest stream.
  *
  * The state IS [[StreamingQuantiles.binCountsBy]] grouped by the class
  * flag — per-(y, bin) counts, associative/commutative, ≤ 2 · bins rows
  * total (bounded, the reference's own histogram-merge fold,
  * compute_histogram/main.py:244-245). The read-side pivots the state to
  * per-bin (n_pos, n_neg) and folds the Mann-Whitney pair count over the
  * ≤ bins-row relation, like the batch operator. Because within-bin pair
  * order is unobservable at bin resolution, the read reports the midpoint
  * (ties-at-1/2, the batch `binnedAuc` convention) AND the worst-case
  * interval: `err_lo` counts every within-bin pair against the score,
  * `err_hi` counts every one for it — the EXACT score-level AUC provably
  * lies in `[err_lo, err_hi]`, so bin width is the only error term
  * (StreamingAucSpec pins state equivalence and the bracket).
  */
object StreamingAuc {

  /** The incremental state: per-(y, bin) counts over a fixed quantization
    * domain. `values` needs a double `value` column and an integer 0/1 `y`
    * column; the same expression tree runs batch or streaming.
    */
  def classBinCounts(values: DataFrame, spec: BinSpec): DataFrame =
    StreamingQuantiles.binCountsBy(values, spec, Seq("y"))

  /** One-row AUC readout from a `(y, bin, cnt)` state relation: midpoint
    * `auc` plus the worst-case `[err_lo, err_hi]` bracket. Both windows
    * run over the ≤ bins-row pivoted state, never over data; pair
    * products run in DECIMAL(38,0) (pos × neg passes 2^63 near 10^10
    * rows). A stream that has only seen one class yields NULLs — the
    * statistic is undefined, not 0.
    */
  def aucFromState(state: DataFrame): DataFrame = {
    val perBin = state
      .groupBy(col("bin"))
      .agg(
        sum(when(col("y") === 1, col("cnt")).otherwise(0L)).as("n_pos"),
        sum(when(col("y") === 1, 0L).otherwise(col("cnt"))).as("n_neg"))
    val cum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    perBin
      .select(col("n_pos"), col("n_neg"),
        (sum(col("n_neg")).over(cum) - col("n_neg")).as("neg_below"))
      .agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum(dec(col("n_pos")) * dec(lit(2L) * col("neg_below") + col("n_neg"))).as("u2"),
        sum(dec(col("n_pos")) * dec(col("neg_below"))).as("u_min"),
        sum(dec(col("n_pos")) * dec(col("neg_below") + col("n_neg"))).as("u_max"))
      .select(
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(dbl(col("u2")) / (lit(2.0) * dbl(col("n_pos")) * dbl(col("n_neg"))), 6))
          .as("auc"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(dbl(col("u_min")) / (dbl(col("n_pos")) * dbl(col("n_neg"))), 6))
          .as("err_lo"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(dbl(col("u_max")) / (dbl(col("n_pos")) * dbl(col("n_neg"))), 6))
          .as("err_hi"))
  }

  /** Precision/recall/F1/AP ladder read off the SAME `(y, bin, cnt)`
    * state — one maintained class-bin histogram, two monitors (AUC
    * bracket + operating table), zero extra stream passes. Pivots the
    * state to per-bin `(n, n_pos)` and delegates to the batch readout
    * ([[graft.operators.EvalOps.prFromBins]]), so stream and batch share
    * exact code (StreamingAucSpec pins the equivalence).
    */
  def prFromState(state: DataFrame): DataFrame =
    graft.operators.EvalOps.prFromBins(
      state
        .groupBy(col("bin").cast("bigint").as("bin"))
        .agg(
          sum(col("cnt")).as("n"),
          sum(when(col("y") === 1, col("cnt")).otherwise(0L)).as("n_pos")))
}
