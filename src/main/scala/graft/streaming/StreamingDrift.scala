package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.BinSpec

/** Streaming drift readouts over the SAME class-split bin state as
  * [[StreamingAuc]] ([[StreamingQuantiles.binCountsBy]] grouped by a 0/1
  * population flag): the live "has the distribution moved?" gauges —
  * PSI and the gridded two-sample KS — read off the mergeable state at
  * any time, no history replay.
  *
  * Both readouts are pure functions of the ≤ 2·bins-row state (the same
  * relation the AUC reads), so one incremental aggregation feeds all
  * three monitors. Batch twins: `drift_psi` (EvalOps.psiContributions)
  * and `drift_ks` — the state-side formulas are the same integer
  * arithmetic on per-bin counts; the only difference is the fixed
  * quantization domain every streaming state pays
  * ([[StreamingHistogram]]'s trade).
  */
object StreamingDrift {

  /** The incremental state: [[StreamingAuc.classBinCounts]] — per-(y, bin)
    * counts where `y` tags the reference (1) vs current (0) population.
    */
  def classBinCounts(values: DataFrame, spec: BinSpec): DataFrame =
    StreamingAuc.classBinCounts(values, spec)

  /** PSI readout from a `(y, bin, cnt)` state: per-bin Laplace-smoothed
    * (+1/2, over the OCCUPIED bins) contributions
    * (p_cur − p_ref)·ln(p_cur / p_ref), ordered by bin — the scalar PSI
    * is the trivial sum. One ≤ bins-row pivot + two bounded windows.
    * Output: `(bin, n_ref, n_cur, psi_contrib)`.
    */
  def psiFromState(state: DataFrame): DataFrame = {
    val perBin = state
      .groupBy(col("bin"))
      .agg(
        sum(when(col("y") === 1, col("cnt")).otherwise(0L)).as("n_ref"),
        sum(when(col("y") === 1, 0L).otherwise(col("cnt"))).as("n_cur"))
    val all = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    val withTot = perBin.select(col("bin"), col("n_ref"), col("n_cur"),
      sum(col("n_ref")).over(all).as("tr"),
      sum(col("n_cur")).over(all).as("tc"),
      count(lit(1)).over(all).as("nb"))
    val pr = (dbl(col("n_ref")) + lit(0.5)) / (dbl(col("tr")) + dbl(col("nb")) * lit(0.5))
    val pc = (dbl(col("n_cur")) + lit(0.5)) / (dbl(col("tc")) + dbl(col("nb")) * lit(0.5))
    withTot.select(
      col("bin"), col("n_ref"), col("n_cur"),
      round((pc - pr) * log(pc / pr), 6).as("psi_contrib"))
      .orderBy(col("bin"))
  }

  /** Gridded two-sample KS readout from a `(y, bin, cnt)` state: the max
    * ECDF gap over the occupied bins (exact FOR THE GRID, like
    * `drift_ks`), with the standard α=0.05 critical value. One-row
    * output: `(n_ref, n_cur, ks_stat, ks_crit, drifted)`; NULLs when a
    * population is empty.
    */
  def ksFromState(state: DataFrame): DataFrame = {
    val perBin = state
      .groupBy(col("bin"))
      .agg(
        sum(when(col("y") === 1, col("cnt")).otherwise(0L)).as("n_ref"),
        sum(when(col("y") === 1, 0L).otherwise(col("cnt"))).as("n_cur"))
    val cum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    val crit = round(lit(1.3581015) *
      sqrt((dbl(col("n_ref")) + dbl(col("n_cur"))) /
        (dbl(col("n_ref")) * dbl(col("n_cur")))), 6)
    perBin
      .select(
        sum(col("n_ref")).over(cum).as("cr"),
        sum(col("n_cur")).over(cum).as("cc"),
        sum(col("n_ref")).over(all).as("tr"),
        sum(col("n_cur")).over(all).as("tc"))
      .agg(
        max(col("tr")).as("n_ref"),
        max(col("tc")).as("n_cur"),
        when(max(col("tr")) > 0L && max(col("tc")) > 0L,
          round(max(abs(dbl(col("cr")) / dbl(col("tr")) -
            dbl(col("cc")) / dbl(col("tc")))), 6)).as("ks_stat"))
      .select(
        col("n_ref"), col("n_cur"), col("ks_stat"),
        when(col("ks_stat").isNotNull, crit).as("ks_crit"),
        when(col("ks_stat").isNotNull, col("ks_stat") > crit).as("drifted"))
  }
}
