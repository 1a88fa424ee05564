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

  /** Transient-state ceiling for the Markov driver solve (round-12
    * verdict #4, the RankOps `MaxDriverGroups = 64` pattern): the solve
    * is (n+2)² map reads per sweep over a collected ≤ (n+2)²-row count
    * relation — 64 channels keeps that a ≤ ~4.4k-entry map, still a
    * trivial driver object, while refusing an event taxonomy wide enough
    * to make "collect the transition counts" a real data movement.
    */
  val MaxMarkovChannels: Int = 64

  /** Channel ceiling for the exact Shapley solve: the subset-sum DP and
    * the marginal loop are O(2ⁿ·n) — 16 channels ≈ 1M integer ops, still
    * instant, while 2ⁿ growth past that would silently turn the driver
    * solve into the bottleneck the bounded-relation design forbids.
    */
  val MaxShapleyChannels: Int = 16

  private val Reserved = Set("start", "conv", "null", "purchase")

  private def checkChannels(channels: Seq[String], max: Int, what: String): Unit = {
    require(channels.nonEmpty, s"$what: channel domain must be non-empty")
    require(channels.distinct.size == channels.size,
      s"$what: duplicate channels in ${channels.mkString(",")}")
    require(channels.size <= max,
      s"$what: ${channels.size} channels exceed the $max-state driver-solve bound — " +
        "a wider taxonomy must be bucketed before attribution")
    val bad = channels.filter(Reserved)
    require(bad.isEmpty, s"$what: reserved state names used as channels: ${bad.mkString(",")}")
  }

  /** Unambiguous memo-tag encoding of a channel domain: length-prefixed
    * join, so `Seq("a,b")` and `Seq("a", "b")` cannot collide the way a
    * bare mkString(",") would.
    */
  private def domainTag(channels: Seq[String]): String =
    channels.map(c => s"${c.length}:$c").mkString("|")

  /** The shared attribution window: per-user events up to and including
    * the FIRST purchase, restricted to the DECLARED state domain
    * (`channels` + purchase — an event type outside the model's state
    * space must not silently become a state the oracle doesn't know;
    * unknown touch types are ignored, exactly as the SQL twin's pivot
    * ignores them). `to_state` maps purchase → `conv`.
    */
  private def journeys(events: DataFrame, channels: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn(
        "prior_purch",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(coalesce(col("prior_purch"), lit(0L)) === 0L)
      .filter(col("event_type").isin((channels :+ "purchase"): _*))
      .withColumn(
        "to_state",
        when(col("event_type") === "purchase", lit("conv")).otherwise(col("event_type")))
  }

  /** Distributed journey → transition-count reduction:
    * `(from_state, to_state, n)` with states `start`, the four channels,
    * and absorbing `conv` (first purchase) / `null` (journey ends
    * unconverted). Events after a user's first purchase are outside the
    * attribution window and drop; event types outside the declared
    * state domain are ignored (see [[journeys]]).
    */
  def transitionCounts(events: DataFrame, channels: Seq[String] = Channels): DataFrame = {
    checkChannels(channels, MaxMarkovChannels, "transitionCounts")
    val journey = journeys(events, channels)
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
      removed: Option[String],
      channels: Seq[String]): Map[String, Long] = {
    val transient = "start" +: channels.filterNot(removed.contains)
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

  /** Per-user journey reduced to (touch-set bitmask, converted) and
    * aggregated to the ≤ 2^|channels|-row conversion-count relation —
    * the distributed leg behind [[shapley]]. Mask bit i =
    * [[Channels]](i) touched before the first purchase; `n_conv` counts
    * converting users per EXACT touch set (direct conversions land on
    * mask 0 and cancel in every Shapley marginal).
    */
  def touchSetCounts(events: DataFrame, channels: Seq[String] = Channels): DataFrame = {
    checkChannels(channels, MaxShapleyChannels, "touchSetCounts")
    journeys(events, channels)
      .groupBy(col("user_id"))
      .agg(
        channels.zipWithIndex
          .map { case (c, i) =>
            max(when(col("event_type") === c, 1L << i).otherwise(0L))
          }
          .reduce(_ + _).as("mask"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .groupBy(col("mask"))
      .agg(sum(col("conv")).as("n_conv"))
  }

  /** Shapley-value attribution (Shapley 1953; the order-free coalition
    * model beside [[markovRemoval]]'s chain model — Zhao et al. 2018):
    * the characteristic function is v(S) = conversions among users whose
    * touch set ⊆ S, and channel c's value is the factorially-weighted
    * mean marginal φ_c = Σ_{S∌c} |S|!(n−|S|−1)!/n! · (v(S∪c) − v(S)).
    *
    * Everything is EXACT integer arithmetic: the distributed leg is
    * [[touchSetCounts]]'s ≤ 2ⁿ-row mask relation (collected as a bounded
    * stats read, session-memoized), v comes from ONE sum-over-subsets DP
    * (O(2ⁿ·n) — the generalized form of the 16-mask subset-sum), and
    * φ·n! is an integer combination of factorially-weighted marginals
    * accumulated in BigInt (overflow-checked back to long) — the oracle
    * unrolls the identical sums, so the only float is the final
    * 6-decimal credit share. Efficiency (Σφ = v(full) − v(∅)) is
    * spec-pinned. Output per channel: `(channel, phi24, credit)` —
    * `phi24` = n!·φ in conversion-count units (named for the default
    * 4-channel domain's 4! = 24; the oracle schema keeps the name);
    * `credit` = φ / Σφ (NULL when no channel carries value). The channel
    * domain is caller-parameterized (round-12 verdict #4), guarded at
    * [[MaxShapleyChannels]] so a wide taxonomy can't silently blow up
    * the 2ⁿ driver solve.
    */
  def shapley(events: DataFrame, channels: Seq[String] = Channels): DataFrame = {
    checkChannels(channels, MaxShapleyChannels, "shapley")
    val spark = events.sparkSession
    val n = channels.size
    val full = (1 << n) - 1
    val counts: Map[Int, Long] =
      DedupOps.sessionValue(events, s"shapleyCounts:${domainTag(channels)}") {
        touchSetCounts(events, channels).collect()
          .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      }
    // v(S) = conversions among touch sets ⊆ S: sum-over-subsets DP, one
    // in-place sweep per channel bit — O(2ⁿ·n) and exact in Long (each
    // entry is a partial sum of disjoint user counts).
    val v = Array.tabulate(full + 1)(t => counts.getOrElse(t, 0L))
    for (i <- 0 until n; s <- 0 to full)
      if ((s & (1 << i)) != 0) v(s) += v(s ^ (1 << i))
    def fact(x: Int): BigInt = (1 to x).foldLeft(BigInt(1))(_ * _)
    val weight: Array[BigInt] =
      Array.tabulate(n)(size => fact(size) * fact(n - size - 1))
    val phi24: Seq[Long] = channels.indices.map { i =>
      val bit = 1 << i
      val phi = (0 to full).foldLeft(BigInt(0)) { (acc, s) =>
        if ((s & bit) == 0)
          acc + weight(Integer.bitCount(s)) * BigInt(v(s | bit) - v(s))
        else acc
      }
      require(phi.isValidLong,
        s"shapley: n!·φ overflows long at ${channels.size} channels — reduce the domain")
      phi.toLong
    }
    // the SUM of per-channel-valid longs can still wrap (16 channels ×
    // ~1.3e18 each) — accumulate in BigInt; only the ratio needs it
    val sumPhi = phi24.foldLeft(BigInt(0))(_ + _)
    val rows = channels.zipWithIndex.map { case (c, i) =>
      val credit =
        if (sumPhi == 0) null
        else java.lang.Double.valueOf(
          math.round(phi24(i).toDouble / sumPhi.toDouble * 1e6) / 1e6)
      Row(c, phi24(i), credit)
    }
    val schema = StructType(Seq(
      StructField("channel", StringType, nullable = false),
      StructField("phi24", LongType, nullable = false),
      StructField("credit", DoubleType, nullable = true)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** One row per channel: base start→conv probability, the probability
    * with the channel removed, the removal effect, and the normalized
    * credit (NULL when no channel has positive effect). `iters` sweeps,
    * default 12 — part of the model's deterministic spec.
    */
  def markovRemoval(
      events: DataFrame,
      iters: Int = 12,
      channels: Seq[String] = Channels): DataFrame = {
    checkChannels(channels, MaxMarkovChannels, "markovRemoval")
    val spark = events.sparkSession
    val tc = transitionCounts(events, channels)
    val counts: Map[(String, String), Long] =
      DedupOps.sessionValue(events, s"markovCounts:${domainTag(channels)}") {
        tc.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      }
    val pBase = solve(counts, iters, None, channels)("start")
    val removed =
      channels.map(c => c -> solve(counts, iters, Some(c), channels)("start")).toMap
    val sumRe = channels.map(c => pBase - removed(c)).sum
    val rows = channels.map { c =>
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
