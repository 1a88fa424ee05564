package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{BinMethod, BinSpec}
import graft.operators.EvalOps
import graft.streaming.{StreamingConformal, StreamingQuantiles}

/** The streaming conformal twin against the exact batch operator:
  *
  *  1. incremental bin-count state across micro-batches == batch state,
  *     and the readout is the same pure function of that state;
  *  2. the bracket property — the EXACT batch cutoff lies in
  *     `[thr_lo, thr_hi)` and batch `n_covered` in
  *     `[n_cov_lo, n_cov_hi]`;
  *  3. the conservative direction — covering at `thr_lo` can only raise
  *     coverage, so the (1−α) marginal guarantee survives quantization;
  *  4. the batch operator's edges (k > n → NULL cutoff, empty test).
  */
class StreamingConformalSpec extends SparkSpec {
  import spark.implicits._

  // scores are nonnegative values in [0, 10) → 1000 linear bins
  private val spec = BinSpec(0, 1000, 0.0, BinMethod.Linear)

  private def states(calib: Seq[Double], test: Seq[Double]) = (
    StreamingQuantiles.binCounts(calib.toDF("value"), spec),
    StreamingQuantiles.binCounts(test.toDF("value"), spec))

  // the batch operator consumes integer nano scores; ×1e9 keeps the two
  // domains aligned exactly for these fixture values
  private def scoredNano(calib: Seq[Double], test: Seq[Double]) =
    (calib.map(v => (math.round(v * 1e9), 1, true)) ++
      test.map(v => (math.round(v * 1e9), 1, false)))
      .toDF("score_nano", "label", "is_calib")

  test("cutoff bin brackets the exact batch cutoff; covered count bracketed") {
    // 9 calib scores 0.1..0.9 (α=0.1 → exact thr 0.1), test 0.05/0.1/0.95
    val calib = (1 to 9).map(_ / 10.0)
    val test = Seq(0.05, 0.1, 0.95)
    val (cs, ts) = states(calib, test)
    val r = StreamingConformal.coverageFromState(cs, ts, spec).collect()(0)
    val b = EvalOps.conformalCoverage(scoredNano(calib, test)).collect()(0)
    assert(r.getLong(0) == b.getLong(0)) // n_calib
    val (thrLo, thrHi) = (r.getDouble(2), r.getDouble(3))
    val exactThr = b.getLong(1) / 1e9
    // half-open bracket for every interior bin; the equality case is
    // legal ONLY for the grid's closed last bin (upper-edge clamp)
    assert(thrLo <= exactThr, s"exact thr $exactThr below $thrLo")
    assert(exactThr < thrHi || r.getInt(1) == spec.hi - 1,
      s"exact thr $exactThr at/above $thrHi in interior bin ${r.getInt(1)}")
    assert(r.getLong(4) == b.getLong(2)) // n_test
    val (covLo, covHi) = (r.getLong(5), r.getLong(6))
    assert(covLo <= b.getLong(3) && b.getLong(3) <= covHi,
      s"batch n_covered ${b.getLong(3)} outside [$covLo, $covHi]")
    // conservative direction: thresholding at thr_lo covers >= batch
    assert(test.count(_ >= thrLo) >= b.getLong(3))
  }

  test("randomized bracket + conservative coverage across alpha settings") {
    val rnd = new scala.util.Random(7)
    val calib = Seq.fill(400)(rnd.nextInt(9990) / 1000.0)
    val test = Seq.fill(300)(rnd.nextInt(9990) / 1000.0)
    val (cs, ts) = states(calib, test)
    for ((an, ad) <- Seq((1L, 10L), (1L, 4L), (1L, 2L))) {
      val r = StreamingConformal.coverageFromState(cs, ts, spec, an, ad).collect()(0)
      val b = EvalOps.conformalCoverage(scoredNano(calib, test), an, ad).collect()(0)
      assert(r.getLong(0) == b.getLong(0), s"n_calib at $an/$ad")
      val exactThr = b.getLong(1) / 1e9
      assert(r.getDouble(2) <= exactThr && exactThr < r.getDouble(3), s"bracket at $an/$ad")
      assert(r.getLong(5) <= b.getLong(3) && b.getLong(3) <= r.getLong(6),
        s"covered bracket at $an/$ad")
      // streaming-threshold coverage dominates batch coverage (count
      // domain — the reported ratio is 6-decimal rounded on both sides)
      assert(test.count(_ >= r.getDouble(2)) >= b.getLong(3), s"conservative at $an/$ad")
    }
  }

  test("calibration smaller than 1/alpha: NULL cutoff covers all test rows") {
    val (cs, ts) = states(Seq(0.1, 0.2, 0.3), Seq(0.001, 5.0))
    val r = StreamingConformal.coverageFromState(cs, ts, spec).collect()(0)
    assert(r.getLong(0) == 3 && r.isNullAt(1))
    assert(r.getLong(4) == 2 && r.getLong(5) == 2 && r.getLong(6) == 2)
    assert(r.getDouble(7) == 1.0 && r.getDouble(8) == 1.0)
  }

  test("empty test state: cutoff preserved, n_test 0, NULL coverage") {
    val (cs, ts) = states((1 to 9).map(_ / 10.0), Seq.empty)
    val r = StreamingConformal.coverageFromState(cs, ts, spec).collect()(0)
    assert(r.getLong(0) == 9 && !r.isNullAt(1))
    assert(r.getLong(4) == 0 && r.isNullAt(7) && r.isNullAt(8))
  }

  test("grouped form: per-group cutoffs bracket conformalCoverageBy; edge groups match") {
    // group a: 9 calib scores 0.1..0.9, 3 test; group b: 2 calib (k > n
    // -> NULL cutoff); group c: test-only (no calib -> cover all);
    // group d: calib-only (n_test 0)
    val calib = (1 to 9).map(v => ("a", v / 10.0)) ++
      Seq(("b", 0.5), ("b", 0.6)) ++ Seq(("d", 0.3))
    val test = Seq(("a", 0.05), ("a", 0.1), ("a", 0.95), ("b", 0.01), ("c", 0.7))
    def st(rows: Seq[(String, Double)]) = StreamingQuantiles.binCountsBy(
      rows.toDF("grp", "value"), spec, Seq("grp"))
    val got = StreamingConformal
      .coverageFromStateBy(st(calib), st(test), spec)
      .collect().map(r => r.getString(0) -> r).toMap
    val batch = EvalOps.conformalCoverageBy(
      (calib.map { case (g, v) => (g, math.round(v * 1e9), true) } ++
        test.map { case (g, v) => (g, math.round(v * 1e9), false) })
        .toDF("grp", "score_nano", "is_calib"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a", "b", "c", "d") && got.keySet == batch.keySet)
    for (g <- got.keySet) {
      assert(got(g).getLong(1) == batch(g).getLong(1), s"n_calib $g")
      assert(got(g).getLong(5) == batch(g).getLong(3), s"n_test $g")
      if (batch(g).isNullAt(2)) assert(got(g).isNullAt(2), s"NULL cutoff $g")
      else {
        val exact = batch(g).getLong(2) / 1e9
        assert(got(g).getDouble(3) <= exact && exact < got(g).getDouble(4), s"bracket $g")
      }
      assert(got(g).getLong(6) <= batch(g).getLong(4) &&
        batch(g).getLong(4) <= got(g).getLong(7), s"covered bracket $g")
    }
    // the single-group slice equals the ungrouped readout, column for column
    val aOnly = StreamingConformal.coverageFromState(
      StreamingQuantiles.binCounts(
        calib.filter(_._1 == "a").map(_._2).toDF("value"), spec),
      StreamingQuantiles.binCounts(
        test.filter(_._1 == "a").map(_._2).toDF("value"), spec),
      spec).collect()(0)
    val aGrouped = got("a")
    assert((1 to 9).forall(i =>
      (aOnly.isNullAt(i - 1) && aGrouped.isNullAt(i)) ||
        aOnly.get(i - 1) == aGrouped.get(i)))
  }

  test("incremental state across micro-batches == batch state; readout identical") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val all = Seq.fill(600)(rnd.nextInt(9990) / 1000.0)
    val input = MemoryStream[Double]
    val stream = StreamingQuantiles.binCounts(input.toDF().toDF("value"), spec)
    val query = stream.writeStream
      .format("memory").queryName("conf_state").outputMode("complete").start()
    try {
      input.addData(all.take(200)); query.processAllAvailable()
      input.addData(all.slice(200, 400)); query.processAllAvailable()
      input.addData(all.drop(400)); query.processAllAvailable()
      val streamState = spark.table("conf_state")
      val batchState = StreamingQuantiles.binCounts(all.toDF("value"), spec)
      assert(streamState.except(batchState).isEmpty &&
        batchState.except(streamState).isEmpty)
      val (_, ts) = states(Seq.empty, all.take(100))
      val a = StreamingConformal.coverageFromState(streamState, ts, spec).collect().toSeq
      val bb = StreamingConformal.coverageFromState(batchState, ts, spec).collect().toSeq
      assert(a == bb)
    } finally query.stop()
  }

  test("evaluate-once (r12 verdict #5): readout self-consistent on a non-deterministic state") {
    // an UNMATERIALIZED, unseeded-random calibration state: without the
    // persisted single evaluation, the reported cutoff and the coverage
    // computed from it would come from two different draws and disagree
    val test = (1 to 200).map(_ / 25.0)
    val (_, ts) = states(Seq.empty, test)
    val testBins = ts.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // rand() bakes its seed at construction — a marked-nondeterministic
    // UDF is what actually re-draws on every plan evaluation
    val noisyCnt = udf(() => (scala.util.Random.nextInt(50) + 1).toLong).asNondeterministic()
    for (_ <- 1 to 5) {
      val calib = spark.range(16)
        .select(col("id").cast("int").as("bin"), noisyCnt().as("cnt"))
      val r = StreamingConformal.coverageFromState(calib, ts, spec).collect()(0)
      // recompute covered counts from the REPORTED cutoff over the
      // deterministic test state — must match exactly
      val tb = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val expLo = testBins.collect { case (b, c) if tb.forall(b > _) => c }.sum
      val expHi = testBins.collect { case (b, c) if tb.forall(b >= _) => c }.sum
      assert(r.getLong(5) == expLo && r.getLong(6) == expHi,
        s"coverage inconsistent with reported cutoff $tb: " +
          s"(${r.getLong(5)}, ${r.getLong(6)}) vs ($expLo, $expHi)")
      graft.operators.DedupOps.releaseAllCaches()
    }
  }
}
