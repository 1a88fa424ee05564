package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics and ntile-equivalent bucketing WITHOUT a
  * group-scale sort — the generalized form of the cut-key machinery first
  * built for [[CurationOps.lmBuckets]] (round 7), now the one shared
  * implementation behind every "rank a corpus- or dimension-scale relation"
  * query (`doc_lm_buckets`, `rfm_segments`, `customer_balance_pct`,
  * `group_quantiles`, `winsorized_stats`).
  *
  * The problem: `ntile(k)` / `row_number()` / `percent_rank()` over an
  * unpartitioned (or few-partition) window funnel the whole relation into
  * ≤ |partitions| tasks — fine at sf0.1, a single-task sort of 10⁹ rows at
  * 100 TB. The fix, in histogram space:
  *
  *   1. ONE aggregation per group: row count n plus min/max of the leading
  *      order column (fused — the count is never a separate pass);
  *   2. a fixed-width bin histogram (≤ [[DefaultBins]] rows per group —
  *      bounded by a CONSTANT, never by cardinality);
  *   3. a running-sum window over the BIN relation locates which bin holds
  *      each target rank (window input ≤ nBins rows per group);
  *   4. a `row_number` window over ONLY the target-bin rows (expected
  *      n/nBins rows per partition, partitioned by group × target) recovers
  *      the exact key at each target rank;
  *   5. consumers bucket / threshold / position rows by broadcast
  *      comparison against the recovered keys — fully map-side.
  *
  * Preconditions (callers enforce): `orderCols.head` is numeric and
  * NaN-free (NaN breaks the bin arithmetic — filter first); grouping
  * columns are low-cardinality enough that per-group stats and the bin
  * relation broadcast (bins × groups rows); for bucket assignment the full
  * `orderCols` key is UNIQUE per group (last column a unique tiebreak), so
  * `key <= cut` admits exactly the target rank count — without uniqueness
  * the cut comparison over-admits ties (see the lmBuckets scaladoc note).
  *
  * Degenerate case (round 8): a group whose leading order column is
  * single-valued would collapse to one bin and step 4 would rank that whole
  * group in one task — the one shape that reintroduced the group-scale
  * sort. When a NUMERIC tiebreak column follows the leading order column
  * (every bucket-assignment call site: doc_id / custkey), such a group now
  * falls back to binning on the tiebreak's range instead: within the group
  * the leading value is constant, so order is decided by the tiebreak and
  * tiebreak bins stay monotonic in the full lexicographic key. Only a group
  * whose ENTIRE prefix (leading value and tiebreak both single-valued) is
  * degenerate still ranks in one task — impossible under the unique-key
  * precondition beyond n = 1. With a single or non-numeric-tiebreak
  * orderCols the old documented trade stands.
  * Ordering semantics are ASCENDING over `orderCols`; express DESC by
  * negating the column (all call sites use bounded integer domains).
  *
  * Constant-factor discipline (bench-relevant: these run over CACHED
  * relations, so scheduling dominates at small sf): target ranks are given
  * as EXPRESSIONS over the stats row (`gr_n`) so deriving them costs no
  * extra pass, and `gr_n` rides through to the output so consumers that
  * need n (percent_rank denominators, interpolation positions) don't run
  * their own count pass. Several independent bucketings of one relation
  * should go long-form — tag a `dim` column, explode, and make ONE call
  * with `dim` in grpCols (see `rfm_segments`) — not one call per
  * dimension.
  *
  * All columns this operator introduces are prefixed `gr_` — callers must
  * not carry colliding names.
  */
object RankOps {

  /** Bin count for the rank histogram: bounds every intermediate relation
    * and window partition; 4096 keeps the boundary-bin rank partitions at
    * ~n/4096 rows (the lmBuckets-proven constant).
    */
  val DefaultBins = 4096

  /** Whether the degenerate-group fallback applies: a second order column
    * exists and is numeric, so its range can drive the bin arithmetic when
    * the leading column is single-valued within a group.
    */
  private def tiebreakFallback(base: DataFrame, orderCols: Seq[String]): Boolean =
    orderCols.size >= 2 &&
      base.schema(orderCols(1)).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]

  /** The one stats pass: per-group n plus the leading order column's range
    * — and, when the tiebreak fallback applies, the tiebreak column's range
    * too (still the same single aggregate). Everything downstream derives
    * from this pass.
    */
  private[operators] def groupStats(
      base: DataFrame,
      grpCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    require(grpCols.nonEmpty, "grpCols must be non-empty (use a lit constant for global ranks)")
    val head = orderCols.head
    val aggs =
      Seq(
        count(lit(1)).as("gr_n"),
        min(col(head)).as("gr_lo"),
        max(col(head)).as("gr_hi")) ++
        (if (tiebreakFallback(base, orderCols))
           Seq(min(col(orderCols(1))).as("gr_lo2"), max(col(orderCols(1))).as("gr_hi2"))
         else Seq.empty)
    base.groupBy(grpCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** `base` ⋈ broadcast(stats) plus the `gr_bin` column (fixed-width bin of
    * the leading order column over the group's [min, max]). The double-cast
    * formula is monotonic non-decreasing in the value — all that
    * correctness needs: bin EDGES never decide anything, target ranks do.
    * A group whose leading column is single-valued (hi <= lo) bins on the
    * numeric tiebreak's range instead when one exists (order within such a
    * group IS the tiebreak order, so monotonicity in the lexicographic key
    * holds), else degenerates to bin 0. `gr_n` is kept on every row
    * (constant per group).
    */
  private[operators] def binned(
      base: DataFrame,
      grpCols: Seq[String],
      orderCols: Seq[String],
      st: DataFrame,
      nBins: Int): DataFrame = {
    def binOn(c: Column, lo: Column, hi: Column): Column =
      least(
        lit(nBins - 1L),
        floor((c.cast("double") - lo.cast("double")) / (hi.cast("double") - lo.cast("double")) * nBins))
        .cast("int")
    val headBin = binOn(col(orderCols.head), col("gr_lo"), col("gr_hi"))
    val (bin, statCols) =
      if (tiebreakFallback(base, orderCols)) {
        val tbBin =
          when(col("gr_hi2") <= col("gr_lo2"), lit(0))
            .otherwise(binOn(col(orderCols(1)), col("gr_lo2"), col("gr_hi2")))
        (when(col("gr_hi") <= col("gr_lo"), tbBin).otherwise(headBin),
          Seq("gr_lo", "gr_hi", "gr_lo2", "gr_hi2"))
      } else
        (when(col("gr_hi") <= col("gr_lo"), lit(0)).otherwise(headBin),
          Seq("gr_lo", "gr_hi"))
    base
      .join(broadcast(st), grpCols)
      .withColumn("gr_bin", bin)
      .drop(statCols: _*)
  }

  /** Per-(group, bin) counts with running totals: `gr_cnt`, `gr_cum`
    * (inclusive), `gr_cum_prev` (exclusive). The window runs over the
    * aggregated bin relation — ≤ nBins rows per partition.
    */
  private[operators] def cumBins(binnedDf: DataFrame, grpCols: Seq[String]): DataFrame =
    binnedDf
      .groupBy((grpCols :+ "gr_bin").map(col): _*)
      .agg(count(lit(1)).as("gr_cnt"))
      .withColumn(
        "gr_cum",
        sum(col("gr_cnt")).over(
          Window
            .partitionBy(grpCols.map(col): _*)
            .orderBy(col("gr_bin"))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("gr_cum_prev", col("gr_cum") - col("gr_cnt"))

  /** Shared tail of both keysAtRanks variants: locate each target rank's
    * bin, rank only those bins' rows (partitioned group × target), keep
    * the row AT the rank. Output: grpCols + `gr_tid` + `gr_n` + orderCols.
    */
  private def keysCore(
      base: DataFrame,
      grpCols: Seq[String],
      orderCols: Seq[String],
      st: DataFrame,
      targetsDf: DataFrame,
      nBins: Int): DataFrame = {
    val b = binned(base, grpCols, orderCols, st, nBins)
    val cum = cumBins(b, grpCols)
    val grpEq = grpCols.map(g => col(s"t.$g") === col(s"c.$g")).reduce(_ && _)
    val bounds = broadcast(
      targetsDf.as("t")
        .join(
          cum.as("c"),
          grpEq && col("t.gr_trank") > col("c.gr_cum_prev") &&
            col("t.gr_trank") <= col("c.gr_cum"))
        .select(
          grpCols.map(g => col(s"t.$g")) ++ Seq(
            col("t.gr_tid"),
            col("c.gr_bin"),
            (col("t.gr_trank") - col("c.gr_cum_prev")).as("gr_off")): _*))
    b.join(bounds, grpCols :+ "gr_bin")
      .withColumn(
        "gr_rk",
        row_number().over(
          Window
            .partitionBy((grpCols :+ "gr_tid").map(col): _*)
            .orderBy(orderCols.map(col): _*)))
      .filter(col("gr_rk") === col("gr_off"))
      .select((grpCols :+ "gr_tid" :+ "gr_n").map(col) ++ orderCols.map(col): _*)
  }

  /** The exact keys (the `orderCols` tuple) at caller-chosen target ranks,
    * ranks supplied as a DataFrame: one row per wanted rank with the group
    * columns, a distinct `gr_tid` (int) tag, and `gr_trank` (long, 1-based
    * position in the group's ascending order). Output: group columns +
    * `gr_tid` + `gr_n` + the `orderCols` values at that rank. A rank
    * beyond the group size yields NO row (callers left-join / coalesce).
    *
    * Only `orderCols` are returned — with a non-unique key the row_number
    * among ties is arbitrary, but the VALUE at a given sorted position is
    * not, so the output stays deterministic even without a tiebreak.
    */
  def keysAtRanks(
      base: DataFrame,
      grpCols: Seq[String],
      orderCols: Seq[String],
      targets: DataFrame,
      nBins: Int = DefaultBins): DataFrame =
    keysCore(base, grpCols, orderCols, groupStats(base, grpCols, orderCols), targets, nBins)

  /** [[keysAtRanks]] with ranks as (tid, rank-expression) pairs evaluated
    * against the stats row — the expression may reference `gr_n` (the
    * group's row count). This is the production entry point: the count and
    * the range come from ONE aggregation, and no caller-side count pass or
    * targets relation exists.
    */
  def keysAtRanksBy(
      base: DataFrame,
      grpCols: Seq[String],
      orderCols: Seq[String],
      targets: Seq[(Int, Column)],
      nBins: Int = DefaultBins): DataFrame = {
    val st = groupStats(base, grpCols, orderCols)
    val targetsDf = st
      .select(
        grpCols.map(col) :+ explode(array(targets.map { case (tid, rk) =>
          struct(lit(tid).as("gr_tid"), rk.cast("long").as("gr_trank"))
        }: _*)).as("gr_t"): _*)
      .select(
        grpCols.map(col) ++ Seq(
          col("gr_t.gr_tid").as("gr_tid"),
          col("gr_t.gr_trank").as("gr_trank")): _*)
    keysCore(base, grpCols, orderCols, st, targetsDf, nBins)
  }

  /** The k−1 `ntile(k)`-boundary cut keys per group, one wide row per
    * group: `gr_c1 .. gr_c{k-1}`, each a struct of the `orderCols` values
    * of the LAST row of that tile. Boundary ranks follow ntile exactly:
    * with n = q·k + r, tile j ends at rank j·q + min(j, r) (the first r
    * tiles one row larger). Tiny groups (n < k) produce duplicate cut keys
    * — the bucket expression then assigns rows to the lowest matching tile,
    * which is exactly ntile's behavior (later tiles come up empty).
    */
  def ntileCuts(
      base: DataFrame,
      grpCols: Seq[String],
      orderCols: Seq[String],
      k: Int,
      nBins: Int = DefaultBins): DataFrame = {
    require(k >= 2, "ntileCuts needs k >= 2")
    val targets = (1 until k).map { j =>
      j -> (expr(s"gr_n div $k") * j + least(lit(j.toLong), expr(s"gr_n % $k")))
    }
    val cuts = keysAtRanksBy(base, grpCols, orderCols, targets, nBins)
    val key = struct(orderCols.map(col): _*)
    cuts
      .groupBy(grpCols.map(col): _*)
      .agg(
        max(when(col("gr_tid") === 1, key)).as("gr_c1"),
        (2 until k).map(j => max(when(col("gr_tid") === j, key)).as(s"gr_c$j")): _*)
  }

  /** The ntile bucket of a row given the `{cutPrefix}1..{cutPrefix}{k-1}`
    * cut columns are in scope: lowest tile whose cut key is >= this row's
    * key. The key must be built with the SAME field names/types as the cut
    * structs; the prefix parameter lets several independent bucketings
    * (cut relations renamed per dimension) join onto one base relation.
    */
  def ntileBucketExpr(key: Column, k: Int, cutPrefix: String): Column =
    (1 until k)
      .foldLeft(when(lit(false), 0)) { (acc, j) => acc.when(key <= col(s"$cutPrefix$j"), j) }
      .otherwise(k)

  def ntileBucketExpr(orderCols: Seq[String], k: Int): Column =
    ntileBucketExpr(struct(orderCols.map(col): _*), k, "gr_c")

  /** `base` plus `bucketCol` = `ntile(k) OVER (ORDER BY orderCols)` per
    * group, computed via [[ntileCuts]] + a broadcast comparison — no
    * group-scale sort. `orderCols` must be a unique key per group.
    *
    * When assigning several independent bucketings to the SAME relation
    * (e.g. RFM's three quintiles), explode to long form (`dim` tag in
    * grpCols) and make ONE [[ntileCuts]] call instead of chaining this —
    * each chained call would pay its own stats/histogram/boundary passes.
    */
  def rankBuckets(
      base: DataFrame,
      grpCols: Seq[String],
      orderCols: Seq[String],
      k: Int,
      bucketCol: String,
      nBins: Int = DefaultBins): DataFrame =
    base
      .join(broadcast(ntileCuts(base, grpCols, orderCols, k, nBins)), grpCols)
      .withColumn(bucketCol, ntileBucketExpr(orderCols, k))
      .drop((1 until k).map(j => s"gr_c$j"): _*)

  /** Every base row whose exact 1-based position in the group's ascending
    * `orderCols` order EXCEEDS the group's cut rank, with that position as
    * `gr_pos` (and the group count as `gr_n`) — i.e. `row_number() > cut`
    * without ranking the group in one task. `cutRank` is an expression over
    * the stats row (may reference `gr_n`; `lit(0L)` keeps every row — the
    * "scalable row_number" form). Position = the bin's exclusive running
    * total + a rank within the bin (window partitioned by group × bin,
    * ~n/nBins rows each); only bins at/after the cut bin are ranked at
    * all. `orderCols` must be a unique key per group (ties would make the
    * position among equals arbitrary).
    */
  def rowsAboveRank(
      base: DataFrame,
      grpCols: Seq[String],
      orderCols: Seq[String],
      cutRank: Column,
      nBins: Int = DefaultBins): DataFrame = {
    val st = groupStats(base, grpCols, orderCols)
    val b = binned(base, grpCols, orderCols, st, nBins)
    val cum = cumBins(b, grpCols)
    val cutDf = st.select(grpCols.map(col) ++ Seq(col("gr_n"), cutRank.cast("long").as("gr_cut")): _*)
    val grpEq = grpCols.map(g => col(s"c.$g") === col(s"t.$g")).reduce(_ && _)
    val keep = broadcast(
      cum.as("c")
        .join(cutDf.as("t"), grpEq && col("c.gr_cum") > col("t.gr_cut"))
        .select(
          grpCols.map(g => col(s"c.$g")) ++ Seq(
            col("c.gr_bin"),
            col("c.gr_cum_prev"),
            col("t.gr_cut")): _*))
    b.join(keep, grpCols :+ "gr_bin")
      .withColumn(
        "gr_rk",
        row_number().over(
          Window
            .partitionBy((grpCols :+ "gr_bin").map(col): _*)
            .orderBy(orderCols.map(col): _*)))
      .withColumn("gr_pos", col("gr_cum_prev") + col("gr_rk"))
      .filter(col("gr_pos") > col("gr_cut"))
      .drop("gr_bin", "gr_rk", "gr_cum_prev", "gr_cut")
  }
}
