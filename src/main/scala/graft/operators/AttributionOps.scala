package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Markov removal-effect attribution (Anderl et al. 2014 — the
  * absorbing-chain model that replaced last-touch in marketing
  * analytics): user journeys become a first-order Markov chain over
  * touch states with absorbing `conv`/`null` ends; a channel's credit is
  * its REMOVAL EFFECT — how much the start→conv absorption probability
  * drops when every edge into that channel is redirected to `null` —
  * normalized over channels.
  *
  * Scale shape: the DISTRIBUTED work is the journey scan — two window
  * passes over one user_id partitioning (first-purchase truncation,
  * lag-pair transitions) and a groupBy down to the ≤ (states+1)²-row
  * transition-count relation. The chain solve runs on the DRIVER over
  * that bounded relation (a ≤ ~36-row stats read, session-memoized —
  * the RankOps-literal-path pattern): absorption probabilities by
  * `iters` fixed-point sweeps in EXACT integer-nano arithmetic
  * (BigInt products, floor division — the DuckDB oracle unrolls the
  * identical sweeps in HUGEINT, so every intermediate matches
  * bit-for-bit; `iters` is part of the model spec, not a convergence
  * heuristic).
  *
  * Removal is monotone by construction — every sweep is a
  * non-decreasing function of the neighbor probabilities and removal
  * only zeroes contributions — so `p_conv_removed ≤ p_conv` always
  * (AttributionSpec pins it, plus hand-computed goldens).
  */
object AttributionOps {

  val Channels: Seq[String] = Seq("click", "error", "signup", "view")
  private val Nano = 1000000000L

  /** Distributed journey → transition-count reduction:
    * `(from_state, to_state, n)` with states `start`, the four channels,
    * and absorbing `conv` (first purchase) / `null` (journey ends
    * unconverted). Events after a user's first purchase are outside the
    * attribution window and drop.
    */
  def transitionCounts(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val journey = events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn(
        "prior_purch",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(coalesce(col("prior_purch"), lit(0L)) === 0L)
      .withColumn(
        "to_state",
        when(col("event_type") === "purchase", lit("conv")).otherwise(col("event_type")))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val pairs = journey
      .select(
        coalesce(lag(col("to_state"), 1).over(w2), lit("start")).as("from_state"),
        col("to_state"))
    val openEnds = journey
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("ts_us"), col("event_id"), col("to_state"))).as("m"),
        max(when(col("to_state") === "conv", 1).otherwise(0)).as("converted"))
      .filter(col("converted") === 0)
      .select(col("m.to_state").as("from_state"), lit("null").as("to_state"))
    pairs
      .union(openEnds)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** `iters` fixed-point sweeps of the absorption probability in
    * integer-nano over a collected count map; `removed` channel's
    * incoming edges contribute 0 (≡ redirected to `null`). Returns the
    * nano probability per transient state.
    */
  private def solve(
      counts: Map[(String, String), Long],
      iters: Int,
      removed: Option[String]): Map[String, Long] = {
    val transient = "start" +: Channels.filterNot(removed.contains)
    val outTotals: Map[String, Long] = transient.map { s =>
      s -> counts.collect { case ((f, _), n) if f == s => n }.sum
    }.toMap
    def pOf(state: String, p: Map[String, Long]): BigInt = state match {
      case "conv" => BigInt(Nano)
      case "null" => BigInt(0)
      case s if removed.contains(s) => BigInt(0)
      case s => BigInt(p.getOrElse(s, 0L))
    }
    var p = transient.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      p = transient.map { s =>
        val tot = outTotals(s)
        val v =
          if (tot == 0L) BigInt(0)
          else
            counts.collect { case ((f, t), n) if f == s => BigInt(n) * pOf(t, p) }
              .sum / tot
        s -> v.toLong
      }.toMap
    }
    p
  }

  /** One row per channel: base start→conv probability, the probability
    * with the channel removed, the removal effect, and the normalized
    * credit (NULL when no channel has positive effect). `iters` sweeps,
    * default 12 — part of the model's deterministic spec.
    */
  def markovRemoval(events: DataFrame, iters: Int = 12): DataFrame = {
    val spark = events.sparkSession
    val tc = transitionCounts(events)
    val counts: Map[(String, String), Long] =
      DedupOps.sessionValue(events, s"markovCounts") {
        tc.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      }
    val pBase = solve(counts, iters, None)("start")
    val removed = Channels.map(c => c -> solve(counts, iters, Some(c))("start")).toMap
    val sumRe = Channels.map(c => pBase - removed(c)).sum
    val rows = Channels.map { c =>
      val re =
        if (pBase == 0L) null
        else java.lang.Double.valueOf(
          math.round((pBase - removed(c)).toDouble / pBase.toDouble * 1e6) / 1e6)
      val credit =
        if (sumRe == 0L) null
        else java.lang.Double.valueOf(
          math.round((pBase - removed(c)).toDouble / sumRe.toDouble * 1e6) / 1e6)
      Row(c, pBase, removed(c), re, credit)
    }
    val schema = StructType(Seq(
      StructField("channel", StringType, nullable = false),
      StructField("p_conv_nano", LongType, nullable = false),
      StructField("p_removed_nano", LongType, nullable = false),
      StructField("removal_effect", DoubleType, nullable = true),
      StructField("credit", DoubleType, nullable = true)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}
