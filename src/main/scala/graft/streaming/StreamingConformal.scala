package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.storage.StorageLevel

import graft.core.BinSpec
import graft.operators.{DedupOps, HistogramOps}

/** Streaming twin of [[graft.operators.EvalOps.conformalCoverage]]
  * (round-11 verdict #4): maintain the calibration scores' HISTOGRAM
  * STATE incrementally ([[StreamingQuantiles.binCounts]] — the same
  * mergeable per-bin `count` aggregate every monitor in this package
  * folds) and read the split-conformal cutoff off it at any time — no
  * re-sorting of calibration history, ever.
  *
  * The batch operator takes the k-th largest calibration score with
  * k = ⌈(1−α)(n+1)⌉ — an order statistic, which the bin-count state
  * answers at BIN RESOLUTION exactly like the ntile cuts: the true
  * cutoff provably lies in the located bin's value interval —
  * `[thr_lo, thr_hi)` for every bin except the last, which is CLOSED
  * `[thr_lo, thr_hi]` (a value exactly at the grid's upper edge clamps
  * into bin hi−1, numpy range semantics) — so every output row carries
  * the bracket, and the
  * DETERMINISTIC streaming threshold `thr_lo` (the bin's lower edge) is
  * ≤ the exact cutoff — coverage under the streaming threshold can only
  * be HIGHER than batch, so the (1−α) marginal guarantee survives the
  * quantization (the conservative direction; StreamingConformalSpec pins
  * bracket + bound against the exact batch operator). The test side is
  * a second bin-count state, read as a covered-count bracket:
  * `n_cov_lo` counts test rows in bins strictly above the cutoff bin
  * (certainly ≥ the exact cutoff), `n_cov_hi` adds the cutoff bin
  * itself; batch `n_covered` lies in `[n_cov_lo, n_cov_hi]`.
  *
  * Value-domain contract: scores must be mapped to a NONNEGATIVE value
  * domain before binning (e.g. `cos + 1`). The linear quantize truncates
  * toward zero (reference `int()` semantics, main.py:197), so bins
  * below zero hold `(edge(b−1), edge(b)]` instead of `[edge(b),
  * edge(b+1))` and the one-bin bracket would not hold across zero.
  *
  * State size: ≤ `spec.bins` rows per side — bounded by a constant; the
  * readout windows run over the aggregated state, never over data.
  *
  * Readout contract: the cutoff/coverage readouts reference each state
  * relation more than once, so pass MATERIALIZED state (a streaming
  * sink table, or a persisted/memoized relation — the oracled queries
  * bin a session-memoized scored relation). That is the natural shape:
  * the bin-count state IS the materialized summary the monitors own.
  * ENFORCED for the threshold leg (round-12 verdict #5): the coverage
  * readouts evaluate the cutoff relation exactly ONCE — it is persisted
  * and eagerly materialized (≤ 1 row / ≤ |groups| rows) before both
  * consumers read it, so even a non-deterministic unmaterialized input
  * can never report a cutoff inconsistent with the coverage computed
  * from it (StreamingConformalSpec pins this with an unseeded-random
  * state).
  */
object StreamingConformal {

  /** One-row conformal cutoff read from a calibration bin-count state
    * `(bin, cnt)`: `(n_calib, thr_bin, thr_lo, thr_hi)`. `thr_bin` is
    * NULL when k > n (calibration smaller than 1/α — cover-everything,
    * the batch operator's same edge), with NULL edges.
    */
  def thresholdFromState(
      calibState: DataFrame,
      spec: BinSpec,
      alphaNum: Long = 1L,
      alphaDen: Long = 10L): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen, "need 0 < alpha < 1")
    val wOrd = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // k-th LARGEST score = (n−k+1)-th smallest: locate the bin holding
    // rank r in the cumulative counts — a window over ≤ bins state rows
    val located = calibState
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn(
        "k",
        expr(s"(($alphaDen - $alphaNum) * (n + 1) + $alphaDen - 1) DIV $alphaDen"))
      .withColumn("r", col("n") - col("k") + 1)
      .filter(col("r") >= 1 && col("r") > col("cum") - col("cnt") && col("r") <= col("cum"))
      .agg(max(col("bin")).as("thr_bin")) // 1 row always; NULL when no bin matched
    calibState
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_calib"))
      .crossJoin(broadcast(located))
      .select(
        col("n_calib"),
        col("thr_bin").cast("int").as("thr_bin"),
        HistogramOps.binEdge(col("thr_bin"), spec).as("thr_lo"),
        HistogramOps.binEdge(col("thr_bin") + 1, spec).as("thr_hi"))
  }

  /** Per-group [[thresholdFromState]] — the Mondrian
    * (group-conditional) streaming twin, mirroring
    * [[graft.operators.EvalOps.conformalCoverageBy]]: one cutoff per
    * `grp` from a grouped bin-count state
    * ([[StreamingQuantiles.binCountsBy]], `(grp, bin, cnt)`). Both
    * windows partition by group over ≤ bins-per-group state rows.
    * Output: `(grp, n_calib, thr_bin, thr_lo, thr_hi)`; a group whose
    * rank lands nowhere (k > n) keeps a NULL cutoff.
    */
  def thresholdFromStateBy(
      calibState: DataFrame,
      spec: BinSpec,
      alphaNum: Long = 1L,
      alphaDen: Long = 10L): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen, "need 0 < alpha < 1")
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("grp"))
    val located = calibState
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn(
        "k",
        expr(s"(($alphaDen - $alphaNum) * (n + 1) + $alphaDen - 1) DIV $alphaDen"))
      .withColumn("r", col("n") - col("k") + 1)
      .filter(col("r") >= 1 && col("r") > col("cum") - col("cnt") && col("r") <= col("cum"))
      .groupBy(col("grp"))
      .agg(max(col("bin")).as("thr_bin"))
    calibState
      .groupBy(col("grp"))
      .agg(sum(col("cnt")).as("n_calib"))
      .join(located, Seq("grp"), "left")
      .select(
        col("grp"),
        col("n_calib"),
        col("thr_bin").cast("int").as("thr_bin"),
        HistogramOps.binEdge(col("thr_bin"), spec).as("thr_lo"),
        HistogramOps.binEdge(col("thr_bin") + 1, spec).as("thr_hi"))
  }

  /** Per-group [[coverageFromState]]: full-outer join of the per-group
    * cutoff relation with the per-group test aggregate, so a group with
    * no calibration rows covers all its test rows (NULL cutoff) and a
    * group with no test rows reports n_test 0 — conformalCoverageBy's
    * exact edge contract. Ordered by group.
    */
  def coverageFromStateBy(
      calibState: DataFrame,
      testState: DataFrame,
      spec: BinSpec,
      alphaNum: Long = 1L,
      alphaDen: Long = 10L): DataFrame = {
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    // evaluate-once: both the covered-count leg and the final join read
    // the SAME materialized ≤|groups|-row cutoff relation
    val thr = DedupOps.registerCache(
      thresholdFromStateBy(calibState, spec, alphaNum, alphaDen)
        .persist(StorageLevel.MEMORY_AND_DISK))
    thr.count()
    val cov = testState
      .join(broadcast(thr.select(col("grp"), col("thr_bin").as("tb"))), Seq("grp"), "left")
      .groupBy(col("grp"))
      .agg(
        sum(col("cnt")).as("n_test"),
        sum(when(col("tb").isNull || col("bin") > col("tb"), col("cnt")).otherwise(0L))
          .as("n_cov_lo"),
        sum(when(col("tb").isNull || col("bin") >= col("tb"), col("cnt")).otherwise(0L))
          .as("n_cov_hi"))
    thr.join(cov, Seq("grp"), "full_outer").select(
      col("grp"),
      coalesce(col("n_calib"), lit(0L)).as("n_calib"),
      col("thr_bin"), col("thr_lo"), col("thr_hi"),
      coalesce(col("n_test"), lit(0L)).as("n_test"),
      coalesce(col("n_cov_lo"), lit(0L)).as("n_cov_lo"),
      coalesce(col("n_cov_hi"), lit(0L)).as("n_cov_hi"),
      when(col("n_test") > 0L, round(dbl(col("n_cov_lo")) / dbl(col("n_test")), 6))
        .as("cov_lo"),
      when(col("n_test") > 0L, round(dbl(col("n_cov_hi")) / dbl(col("n_test")), 6))
        .as("cov_hi"))
      .orderBy(col("grp"))
  }

  /** Full conformal readout from calibration + test bin-count states:
    * one row `(n_calib, thr_bin, thr_lo, thr_hi, n_test, n_cov_lo,
    * n_cov_hi, cov_lo, cov_hi)`. A NULL cutoff covers every test row
    * (`n_cov_lo = n_cov_hi = n_test`); an empty test state reports
    * n_test 0 with NULL coverage — the batch operator's guards.
    */
  def coverageFromState(
      calibState: DataFrame,
      testState: DataFrame,
      spec: BinSpec,
      alphaNum: Long = 1L,
      alphaDen: Long = 10L): DataFrame = {
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    // evaluate-once: the cutoff is computed from the (possibly
    // unmaterialized) state exactly once; both consumers read the cache
    val thr = DedupOps.registerCache(
      thresholdFromState(calibState, spec, alphaNum, alphaDen)
        .persist(StorageLevel.MEMORY_AND_DISK))
    thr.count()
    val cov = testState
      .crossJoin(broadcast(thr.select(col("thr_bin").as("tb"))))
      .agg(
        coalesce(sum(col("cnt")), lit(0L)).as("n_test"),
        coalesce(
          sum(when(col("tb").isNull || col("bin") > col("tb"), col("cnt")).otherwise(0L)),
          lit(0L)).as("n_cov_lo"),
        coalesce(
          sum(when(col("tb").isNull || col("bin") >= col("tb"), col("cnt")).otherwise(0L)),
          lit(0L)).as("n_cov_hi"))
    thr.crossJoin(cov).select(
      col("n_calib"), col("thr_bin"), col("thr_lo"), col("thr_hi"),
      col("n_test"), col("n_cov_lo"), col("n_cov_hi"),
      when(col("n_test") > 0L, round(dbl(col("n_cov_lo")) / dbl(col("n_test")), 6))
        .as("cov_lo"),
      when(col("n_test") > 0L, round(dbl(col("n_cov_hi")) / dbl(col("n_test")), 6))
        .as("cov_hi"))
  }
}
