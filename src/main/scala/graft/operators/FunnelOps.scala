package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Staged funnel analysis over an event stream — "of the users who did A,
  * how many later did B, and later still C" — the standard product-
  * analytics sequence query.
  *
  * Stage i is satisfied at the EARLIEST event matching predicate i that
  * occurs strictly after the user's stage-(i−1) time and within `maxGap`
  * of it (min-of-qualifying, the standard windowed-funnel semantics). Each stage is one filter +
  * equi-join on the user key + min aggregation: the stage relation only
  * shrinks, every join is keyed on the user id, and per-user state is one
  * timestamp — no windows over raw events, no per-user event
  * materialization.
  */
object FunnelOps {

  /** Per-user stage times: `(userCol, t1..tN)` for users completing all
    * N stages... users drop out at the stage they fail (inner joins), so
    * stage i's relation IS the stage-i cohort.
    */
  def stageTimes(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      stages: Seq[Column],
      maxGap: Long): Seq[DataFrame] = {
    require(stages.nonEmpty)
    val first = events
      .filter(stages.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t1"))
    stages.tail.zipWithIndex.scanLeft(first) { case (prev, (pred, i)) =>
      events
        .filter(pred)
        .join(prev, Seq(userCol))
        .filter(col(tsCol) > col(s"t${i + 1}") && col(tsCol) <= col(s"t${i + 1}") + lit(maxGap))
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as(s"t${i + 2}"))
    }
  }

  /** One-row funnel summary: total users, per-stage cohort sizes, and
    * step conversion rates (round-6 of exact integer ratios).
    */
  def funnelSummary(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      stages: Seq[Column],
      maxGap: Long): DataFrame = {
    val cohorts = stageTimes(events, userCol, tsCol, stages, maxGap)
    val total = events.agg(count_distinct(col(userCol)).cast("long").as("n_users"))
    val counts = cohorts.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as(s"n_stage${i + 1}"))
    }
    val joined = counts.foldLeft(total)((acc, c) => acc.crossJoin(broadcast(c)))
    val convs = (2 to stages.length).map(i =>
      round(
        col(s"n_stage$i").cast("double") / col(s"n_stage${i - 1}").cast("double"),
        6).as(s"conv_${i - 1}_$i"))
    joined.select(
      col("n_users") +: (1 to stages.length).map(i => col(s"n_stage$i")) ++: convs: _*)
  }
}
