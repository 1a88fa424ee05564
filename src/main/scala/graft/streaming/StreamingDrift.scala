package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.BinSpec

/** Streaming drift readouts over the SAME class-split bin state as
  * [[StreamingAuc]] ([[StreamingQuantiles.binCountsBy]] grouped by a 0/1
  * population flag): the live "has the distribution moved?" gauges —
  * PSI and the gridded two-sample KS — read off the mergeable state at
  * any time, no history replay.
  *
  * Both readouts are pure functions of the ≤ 2·bins-row-per-group state
  * (the same relation the AUC reads), so one incremental aggregation
  * feeds all three monitors. The grouped forms (`psiFromStateBy` /
  * `ksFromStateBy`) monitor MANY features/segments at once — every
  * window is partitioned by the group key and ordered over ≤ bins rows
  * per group, the family's groups × bins parallelism. Batch twins:
  * `drift_psi` (EvalOps.psiContributions) and `drift_ks` — the
  * state-side formulas are the same integer arithmetic on per-bin
  * counts; the only difference is the fixed quantization domain every
  * streaming state pays ([[StreamingHistogram]]'s trade).
  */
object StreamingDrift {

  /** The incremental state: [[StreamingAuc.classBinCounts]] — per-(y, bin)
    * counts where `y` tags the reference (1) vs current (0) population.
    */
  def classBinCounts(values: DataFrame, spec: BinSpec): DataFrame =
    StreamingAuc.classBinCounts(values, spec)

  /** Grouped state: per-(group…, y, bin) counts — one monitored
    * distribution per group key (feature, segment, source…). `values`
    * needs the group columns plus `value` and the 0/1 `y` flag.
    */
  def classBinCountsBy(values: DataFrame, spec: BinSpec, grpCols: Seq[String]): DataFrame =
    StreamingQuantiles.binCountsBy(values, spec, grpCols :+ "y")

  private def dbl(c: Column): Column = c.cast("double")

  private def perBinCounts(state: DataFrame, grpCols: Seq[String]): DataFrame =
    state
      .groupBy((grpCols :+ "bin").map(col): _*)
      .agg(
        sum(when(col("y") === 1, col("cnt")).otherwise(0L)).as("n_ref"),
        sum(when(col("y") === 1, 0L).otherwise(col("cnt"))).as("n_cur"))

  /** PSI readout from a `(…group, y, bin, cnt)` state: per-bin
    * Laplace-smoothed contributions (p_cur − p_ref)·ln(p_cur / p_ref),
    * ordered — the scalar PSI per group is the trivial sum of its rows.
    * One ≤ bins-row-per-group pivot + one partitioned bounded window.
    *
    * Smoothing convention: +1/2 per CONFIGURED bin (`nBins`, the
    * `spec.bins` the state was built with) — the SAME denominator as the
    * batch twin [[graft.operators.EvalOps.psiContributions]], so batch and
    * streaming PSI agree on identical data even when configured bins are
    * empty. (Empty bins contribute no rows here — only occupied bins are
    * materialized in the state — but the shares are normalized as if all
    * `nBins` cells got the +1/2 prior, exactly like the batch form.)
    * Output: `(…group, bin, n_ref, n_cur, psi_contrib)`.
    */
  def psiFromStateBy(state: DataFrame, nBins: Int, grpCols: Seq[String]): DataFrame = {
    val all = Window.partitionBy(grpCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withTot = perBinCounts(state, grpCols)
      .select((grpCols :+ "bin" :+ "n_ref" :+ "n_cur").map(col) ++ Seq(
        sum(col("n_ref")).over(all).as("tr"),
        sum(col("n_cur")).over(all).as("tc")): _*)
    val pr = (dbl(col("n_ref")) + lit(0.5)) / (dbl(col("tr")) + lit(nBins * 0.5))
    val pc = (dbl(col("n_cur")) + lit(0.5)) / (dbl(col("tc")) + lit(nBins * 0.5))
    withTot
      .select((grpCols :+ "bin" :+ "n_ref" :+ "n_cur").map(col) :+
        round((pc - pr) * log(pc / pr), 6).as("psi_contrib"): _*)
      .orderBy((grpCols :+ "bin").map(col): _*)
  }

  /** [[psiFromStateBy]] taking the state's own [[BinSpec]]. */
  def psiFromStateBy(state: DataFrame, spec: BinSpec, grpCols: Seq[String]): DataFrame =
    psiFromStateBy(state, spec.bins, grpCols)

  /** Ungrouped [[psiFromStateBy]]. */
  def psiFromState(state: DataFrame, spec: BinSpec): DataFrame =
    psiFromStateBy(state, spec.bins, Seq.empty)

  /** Gridded two-sample KS readout from a `(…group, y, bin, cnt)` state:
    * the max ECDF gap over the group's occupied bins (exact FOR THE
    * GRID, like `drift_ks`), with the standard α=0.05 critical value.
    * One row per group: `(…group, n_ref, n_cur, ks_stat, ks_crit,
    * drifted)`; NULL stats where a population is empty.
    */
  def ksFromStateBy(state: DataFrame, grpCols: Seq[String]): DataFrame = {
    val cum = Window.partitionBy(grpCols.map(col): _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(grpCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val crit = round(lit(1.3581015) *
      sqrt((dbl(col("n_ref")) + dbl(col("n_cur"))) /
        (dbl(col("n_ref")) * dbl(col("n_cur")))), 6)
    val folded = perBinCounts(state, grpCols)
      .select(grpCols.map(col) ++ Seq(
        sum(col("n_ref")).over(cum).as("cr"),
        sum(col("n_cur")).over(cum).as("cc"),
        sum(col("n_ref")).over(all).as("tr"),
        sum(col("n_cur")).over(all).as("tc")): _*)
      .groupBy(grpCols.map(col): _*)
      .agg(
        max(col("tr")).as("n_ref"),
        max(col("tc")).as("n_cur"),
        when(max(col("tr")) > 0L && max(col("tc")) > 0L,
          round(max(abs(dbl(col("cr")) / dbl(col("tr")) -
            dbl(col("cc")) / dbl(col("tc")))), 6)).as("ks_stat"))
    val out = folded
      .select(grpCols.map(col) ++ Seq(
        col("n_ref"), col("n_cur"), col("ks_stat"),
        when(col("ks_stat").isNotNull, crit).as("ks_crit"),
        when(col("ks_stat").isNotNull, col("ks_stat") > crit).as("drifted")): _*)
    if (grpCols.isEmpty) out else out.orderBy(grpCols.map(col): _*)
  }

  /** Ungrouped [[ksFromStateBy]]. */
  def ksFromState(state: DataFrame): DataFrame = ksFromStateBy(state, Seq.empty)
}
