package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-sequential A/B readout — the anytime-valid sibling of the
  * fixed-horizon `ab_test` z-gate (round-12 verdict #6): the experiment
  * is monitored at `looks` planned interim analyses, and at look k the
  * cumulative Welch z is compared against the O'Brien–Fleming boundary
  * `z_final · √(looks / (k+1))` (O'Brien & Fleming 1979; the √(K/k)
  * shape is the classic form — conservative early, converging to the
  * near-fixed-horizon `z_final` at the last look, which is what makes
  * repeated looks not inflate type-I error). `z_final` is part of the
  * declared design, read off the published OBF tables (e.g. two-sided
  * α = 0.05: 2.04 at K=5, 2.05 at K=10 — vs 1.96 at K=1).
  *
  * Scale/streaming shape: the STATE is [[lookStats]] — per-(look,
  * variant) `(n, Σcents, Σcents²)`, the same three mergeable integer
  * sums as [[StreamingAbTest.variantStats]] just keyed by the declared
  * look calendar, so Structured Streaming folds micro-batches into
  * ≤ 2·looks state rows with no history re-read. The READOUTS
  * ([[obfReadout]], [[msprtReadout]] and their Mondrian `By` twins over
  * a [[lookStatsBy]] state) are pure functions of that bounded state:
  * one pivot aggregation to ≤ (groups·)looks rows, cumulative sums over
  * the look order (a window over the AGGREGATED relation — the engine's
  * bounded-relation-before-window family rule), then the z / boundary /
  * mixture projection. Grouped and ungrouped forms share ONE
  * implementation parameterized by the partition columns, so the twins
  * cannot diverge. Every count/sum is exact integer arithmetic; floats
  * enter only in the final per-look projection, rounded to 6 decimals
  * in the same expression order as the DuckDB oracle.
  *
  * Look assignment must be PRE-DECLARED (a calendar, not a data scan)
  * for the streaming form — [[lookOf]] maps a timestamp onto K equal
  * slices of a declared `[t0, t1]` window; the batch oracle query
  * derives t0/t1 in-plan from min/max, which is the same expression
  * with the 1-row bounds relation cross-joined in.
  */
object StreamingSequential {

  /** Look index 0..looks−1 for a timestamp within declared bounds
    * (equal slices of `[t0, t1]`, floor semantics, BOTH edges clamped:
    * a timestamp past t1 lands in the last look, one before t0 — clock
    * skew against a declared calendar — in the first, never a negative
    * index corrupting the cumulative order). Exact integral division
    * via the pmod identity — `a DIV b = (a − pmod(a, b)) / b` — with the
    * final division in DECIMAL(38,0) (round-13 advice #1: Spark's `/` on
    * longs is double division, so a calendar wider than ~2⁵³/looks
    * microseconds could round the quotient across an integer boundary
    * and misassign an edge timestamp by one look; the decimal quotient
    * is exact for every representable long dividend, like DuckDB's
    * integral `//`). Column has no integral-divide operator, hence the
    * identity. Contract: the caller declares a real calendar, `t1 ≥ t0`
    * — with an inverted calendar the denominator is ≤ 0 and the pmod
    * identity silently degrades (the oracled batch entries derive
    * t0/t1 from min/max, which cannot invert).
    */
  def lookOf(ts: Column, t0: Column, t1: Column, looks: Int): Column = {
    val num = greatest(lit(0L), ts - t0) * lit(looks.toLong)
    val den = t1 - t0 + lit(1L)
    least(
      lit(looks - 1L),
      ((num - pmod(num, den)).cast("decimal(38,0)") / den.cast("decimal(38,0)"))
        .cast("bigint"))
  }

  /** Per-(look, variant) sufficient statistics `(look, variant, n, s,
    * q)` — runnable identically on a batch or streaming
    * `(user_id, value, <look source>)` input; `look` is any
    * deterministic per-row column (use [[lookOf]] over a declared
    * calendar for streams).
    */
  def lookStats(events: DataFrame, look: Column): DataFrame =
    lookStatsImpl(events, look, Seq.empty)

  /** Per-(group, look, variant) sufficient statistics — the Mondrian
    * (group-conditional) state, mirroring the conformal `By` family:
    * one monitor per segment from one aggregation. Input needs a `grp`
    * column; output `(grp, look, variant, n, s, q)`.
    */
  def lookStatsBy(events: DataFrame, look: Column): DataFrame =
    lookStatsImpl(events, look, Seq("grp"))

  private def lookStatsImpl(
      events: DataFrame,
      look: Column,
      grp: Seq[String]): DataFrame =
    events
      .filter(col("value").isNotNull && !isnan(col("value")))
      .select(
        grp.map(col) ++ Seq(
          look.cast("bigint").as("look"),
          pmod(col("user_id"), lit(2L)).as("variant"),
          (col("value") * lit(100.0)).cast("bigint").as("c")): _*)
      .groupBy((grp :+ "look" :+ "variant").map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))

  /** Per-(grp?, look) CUMULATIVE sufficient stats `(grp?, look, n_a,
    * n_b, s_a, s_b, q_a, q_b)` — one pivot aggregation to ≤
    * (groups·)looks rows, then running sums over the look order within
    * each group (a window over the AGGREGATED relation).
    */
  private def cumStats(state: DataFrame, grp: Seq[String]): DataFrame = {
    val a = col("variant") === 0L
    val per = state
      .groupBy((grp :+ "look").map(col): _*)
      .agg(
        sum(when(a, col("n")).otherwise(0L)).as("dn_a"),
        sum(when(a, lit(0L)).otherwise(col("n"))).as("dn_b"),
        sum(when(a, col("s")).otherwise(0L)).as("ds_a"),
        sum(when(a, lit(0L)).otherwise(col("s"))).as("ds_b"),
        sum(when(a, col("q")).otherwise(0L)).as("dq_a"),
        sum(when(a, lit(0L)).otherwise(col("q"))).as("dq_b"))
    val wCum = Window.partitionBy(grp.map(col): _*).orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, 0)
    per.select(
      grp.map(col) ++ Seq(
        col("look"),
        sum(col("dn_a")).over(wCum).as("n_a"),
        sum(col("dn_b")).over(wCum).as("n_b"),
        sum(col("ds_a")).over(wCum).as("s_a"),
        sum(col("ds_b")).over(wCum).as("s_b"),
        sum(col("dq_a")).over(wCum).as("q_a"),
        sum(col("dq_b")).over(wCum).as("q_b")): _*)
  }

  private def dbl(c: Column): Column = c.cast("double")

  /** Welch pieces over the cumulative columns — shared by every readout
    * so a formula fix cannot diverge between the twins.
    */
  private def welchV: Column = {
    val va = (dbl(col("q_a")) - dbl(col("s_a")) * dbl(col("s_a")) / dbl(col("n_a"))) /
      (dbl(col("n_a")) - lit(1.0))
    val vb = (dbl(col("q_b")) - dbl(col("s_b")) * dbl(col("s_b")) / dbl(col("n_b"))) /
      (dbl(col("n_b")) - lit(1.0))
    va / dbl(col("n_a")) + vb / dbl(col("n_b"))
  }

  private def welchDelta: Column =
    dbl(col("s_a")) / dbl(col("n_a")) - dbl(col("s_b")) / dbl(col("n_b"))

  /** O'Brien–Fleming sequential readout over a [[lookStats]] state
    * relation: one row per look with the CUMULATIVE stats, the Welch z
    * (NULL until both arms have ≥ 2 units), the OBF boundary, the
    * per-look crossing flag, and `decide_look` — the first crossing
    * look (NULL if the boundary is never crossed; constant across
    * rows, the experiment's stop decision). Deterministic: exact
    * integer sums, floats only in the final projection, both rounded
    * to 6 decimals.
    */
  def obfReadout(state: DataFrame, looks: Int, zFinal: Double): DataFrame =
    obfImpl(state, Seq.empty, looks, zFinal)

  /** Per-group [[obfReadout]] — one O'Brien–Fleming boundary table per
    * segment from a [[lookStatsBy]] state; `decide_look` is per group.
    * Every window partitions by `grp` over the aggregated ≤
    * groups·looks-row relation. Output ordered `(grp, look)`.
    */
  def obfReadoutBy(state: DataFrame, looks: Int, zFinal: Double): DataFrame =
    obfImpl(state, Seq("grp"), looks, zFinal)

  private def obfImpl(
      state: DataFrame,
      grp: Seq[String],
      looks: Int,
      zFinal: Double): DataFrame = {
    require(looks >= 1, "need at least one look")
    val z = welchDelta / sqrt(welchV)
    val bound = lit(zFinal) *
      sqrt(lit(looks.toDouble) / (dbl(col("look")) + lit(1.0)))
    val wAll = Window.partitionBy(grp.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cumStats(state, grp)
      .select(
        grp.map(col) ++ Seq(
          col("look"), col("n_a"), col("n_b"),
          when(col("n_a") > 1L && col("n_b") > 1L, round(z, 6)).as("z_k"),
          round(bound, 6).as("bound_k")): _*)
      .withColumn(
        "crossed",
        col("z_k").isNotNull && abs(col("z_k")) >= col("bound_k"))
      .withColumn(
        "decide_look",
        min(when(col("crossed"), col("look"))).over(wAll))
      .orderBy((grp :+ "look").map(col): _*)
  }

  /** Mixture-SPRT always-valid readout over a [[lookStats]] state — the
    * ANYTIME sibling of [[obfReadout]] (Johari et al. 2017, "Peeking at
    * A/B tests"; Robbins 1970 mixture rule): at every look the Gaussian
    * mixture likelihood ratio of the cumulative mean difference,
    * `log Λ = ½·ln(V/(V+τ²)) + Δ²·τ²/(2·V·(V+τ²))` with Δ the Welch
    * mean difference (cents), `V = v_a/n_a + v_b/n_b` its variance
    * estimate, and τ the declared mixture scale (cents — part of the
    * design, like z_final). The always-valid p-value is the running
    * minimum `p_k = min(1, 1/max_{j≤k} Λ_j)` — valid at EVERY look
    * simultaneously, no look calendar commitment (the OBF boundary needs
    * its K declared up front; this needs only τ).
    *
    * Scale/determinism: identical bounded state and window discipline as
    * [[obfReadout]]; the only transcendentals (ln/exp/sqrt) land in the
    * final per-look projection, rounded to 6 decimals in the same
    * expression order as the DuckDB oracle (the engine's 1-ulp rule).
    *
    * The same mixture inverts to the ANYTIME-VALID CONFIDENCE SEQUENCE
    * (Howard et al. 2021's mixture boundary; the interval dashboards
    * actually watch): `{θ : Λ(θ) < 1/α}` =
    * `Δ ± √( (2·V·(V+τ²)/τ²) · ln(√((V+τ²)/V)/α) )` — simultaneously
    * valid at every look, so peeking at the interval is legal by
    * construction. Output per look: `(look, n_a, n_b, delta_c,
    * log_lambda, ci_lo, ci_hi, p_always, decide_look)` — `decide_look`
    * is the first look with `p_always ≤ α` (NULL when never; constant
    * per group, the stop decision — [[obfReadout]]'s same contract);
    * looks where either arm has < 2 units carry NULL log_lambda/ci and
    * inherit the running p (p starts at 1).
    */
  def msprtReadout(
      state: DataFrame,
      tauCents: Double,
      alpha: Double = 0.05): DataFrame =
    msprtImpl(state, Seq.empty, tauCents, alpha)

  /** Per-group [[msprtReadout]] — always-valid p and confidence sequence
    * per segment; the running max partitions by `grp`. Output ordered
    * `(grp, look)`.
    */
  def msprtReadoutBy(
      state: DataFrame,
      tauCents: Double,
      alpha: Double = 0.05): DataFrame =
    msprtImpl(state, Seq("grp"), tauCents, alpha)

  private def msprtImpl(
      state: DataFrame,
      grp: Seq[String],
      tauCents: Double,
      alpha: Double): DataFrame = {
    require(tauCents > 0.0, "mixture scale must be positive")
    require(alpha > 0.0 && alpha < 1.0, "need 0 < alpha < 1")
    val v = welchV
    val delta = welchDelta
    val tau2 = lit(tauCents * tauCents)
    val logLambda =
      lit(0.5) * log(v / (v + tau2)) +
        delta * delta * tau2 / (lit(2.0) * v * (v + tau2))
    // mixture-CS half width: the sqrt argument is always ≥ 0 because
    // √((V+τ²)/V) > 1 > α
    val halfWidth = sqrt(
      (lit(2.0) * v * (v + tau2) / tau2) *
        log(sqrt((v + tau2) / v) / lit(alpha)))
    val wellDefined = col("n_a") > 1L && col("n_b") > 1L && v > lit(0.0)
    val wRun = Window.partitionBy(grp.map(col): _*).orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cumStats(state, grp)
      .select(
        grp.map(col) ++ Seq(
          col("look"), col("n_a"), col("n_b"),
          // round-13 advice #2: a look where one arm has zero cumulative
          // units would project 0/0 → NaN in Spark while DuckDB's
          // division-by-zero behavior is configuration-dependent — gate
          // the projection (NULL on degenerate looks, both twins)
          when(col("n_a") > 0L && col("n_b") > 0L, round(delta, 6)).as("delta_c"),
          when(wellDefined, round(logLambda, 6)).as("log_lambda"),
          when(wellDefined, round(delta - halfWidth, 6)).as("ci_lo"),
          when(wellDefined, round(delta + halfWidth, 6)).as("ci_hi")): _*)
      .withColumn(
        "p_always",
        // coalesce before greatest: max() skips NULL looks in both
        // engines, but DuckDB's greatest propagates a NULL argument
        round(exp(-greatest(lit(0.0), coalesce(max(col("log_lambda")).over(wRun), lit(0.0)))), 6))
      .withColumn(
        "decide_look",
        min(when(col("p_always") <= lit(alpha), col("look"))).over(
          Window.partitionBy(grp.map(col): _*)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .orderBy((grp :+ "look").map(col): _*)
  }
}
