package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the contingency-audit family
  * ([[graft.operators.EvalOps.cohenKappa]] /
  * [[graft.operators.EvalOps.chi2Independence]] /
  * [[graft.operators.EvalOps.categoricalMi]]): keep ONE incrementally
  * maintained `(a, b, n_ab)` cell state and read rater agreement,
  * split-balance chi-square, and mutual information off it at any time —
  * three live monitors from one aggregation, the same
  * one-state-many-readouts design as [[StreamingAuc]]/[[StreamingDrift]].
  *
  * The state is a plain keyed COUNT over the bounded label pair —
  * associative, commutative, merge = add (the reference's histogram-fold
  * mergeability argument, compute_histogram/main.py:244-245); ≤ |A|·|B|
  * rows regardless of stream length. Every readout is a pure function of
  * the state ([[graft.operators.EvalOps.cohenKappaFromCells]] and
  * siblings), so stream and batch answers are equal by construction —
  * pinned in `StreamingContingencySpec`.
  */
object StreamingContingency {

  /** The incremental state: per-(a, b) counts. `values` needs the two
    * bounded categorical columns `a` and `b` (cast ordinal labels to
    * LONG upstream for the kappa readout); the same expression tree runs
    * batch or streaming (complete/update mode).
    */
  def cellCounts(values: DataFrame): DataFrame =
    values.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))

  /** Chance-corrected agreement readout — one row, see
    * [[graft.operators.EvalOps.cohenKappa]] for semantics.
    */
  def kappaFromState(state: DataFrame, k: Int): DataFrame =
    graft.operators.EvalOps.cohenKappaFromCells(state, k)

  /** Per-cell chi-square independence readout over the densified grid. */
  def chi2FromState(state: DataFrame): DataFrame =
    graft.operators.EvalOps.chi2FromCells(state, "a", "b")

  /** Per-cell mutual-information readout. */
  def miFromState(state: DataFrame): DataFrame =
    graft.operators.EvalOps.miFromCells(state, "a", "b")
}
