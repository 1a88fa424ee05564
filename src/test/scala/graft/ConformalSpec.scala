package graft

import org.apache.spark.sql.functions._

import graft.operators.EvalOps

/** EvalOps.conformalCoverage: order-statistic cutoff, tiny-calibration
  * −∞ edge, and the split-conformal marginal guarantee on an exchangeable
  * synthetic score distribution.
  */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  private def scored(rows: Seq[(Long, Int, Boolean)]) =
    rows.toDF("score_nano", "label", "is_calib")

  test("cutoff is the ceil((n+1)(1-alpha))-th smallest nonconformity") {
    // 9 calib positives with scores 10..90: n=9, alpha=0.1 → k=ceil(10*0.9)=9
    // → 9th smallest nonconformity = smallest score = 10.
    val calib = (1 to 9).map(i => (i * 10L, 1, true))
    val test = Seq((5L, 1, false), (10L, 1, false), (95L, 1, false))
    val r = EvalOps.conformalCoverage(scored(calib ++ test)).collect()(0)
    assert(r.getLong(0) == 9) // n_calib
    assert(r.getLong(1) == 10L) // thr = k-th largest score
    assert(r.getLong(2) == 3 && r.getLong(3) == 2) // 10 and 95 covered, 5 not
    assert(math.abs(r.getDouble(4) - 2.0 / 3.0) < 1e-6)
  }

  test("alpha=1/4 moves the cutoff up the ladder") {
    // n=7, k=ceil(8*3/4)=6 → thr = 6th largest of 10..70 = 20.
    val calib = (1 to 7).map(i => (i * 10L, 1, true))
    val test = Seq((15L, 1, false), (20L, 1, false), (70L, 1, false))
    val r = EvalOps
      .conformalCoverage(scored(calib ++ test), alphaNum = 1L, alphaDen = 4L)
      .collect()(0)
    assert(r.getLong(1) == 20L)
    assert(r.getLong(3) == 2)
  }

  test("calibration smaller than 1/alpha yields a null cutoff covering all") {
    // n=3, alpha=0.1 → k=ceil(4*0.9)=4 > n → thr NULL, everything covered.
    val calib = Seq((10L, 1, true), (20L, 1, true), (30L, 1, true))
    val test = Seq((-999L, 1, false), (1L, 1, false))
    val r = EvalOps.conformalCoverage(scored(calib ++ test)).collect()(0)
    assert(r.isNullAt(1))
    assert(r.getLong(3) == 2)
    assert(r.getDouble(4) == 1.0)
  }

  test("marginal guarantee holds on an exchangeable split") {
    // Deterministic pseudo-scores; even index → calib, odd → test. Same
    // distribution on both sides, so coverage ≈ 0.9 and never below
    // 1 - alpha - O(1/n) for this fixed sample.
    val rows = (0 until 2000).map { i =>
      val score = ((i * 2654435761L) % 100003L) - 50000L
      (score, 1, i % 2 == 0)
    }
    val r = EvalOps.conformalCoverage(scored(rows)).collect()(0)
    assert(r.getLong(0) == 1000)
    val cov = r.getDouble(4)
    assert(cov >= 0.88 && cov <= 0.93, s"coverage $cov outside [0.88, 0.93]")
  }

  test("empty test partition preserves n_calib and the cutoff") {
    // the threshold relation must be re-attached to the test AGGREGATE,
    // not read through the (vanished) test rows: a non-empty calibration
    // set with zero test rows still reports its real n_calib / thr_nano
    // (mirrors conformalCoverageBy's full-outer-join behavior)
    val calib = (1 to 9).map(i => (i * 10L, 1, true))
    val r = EvalOps.conformalCoverage(scored(calib)).collect()(0)
    assert(r.getLong(0) == 9, "n_calib must survive an empty test set")
    assert(r.getLong(1) == 10L, "thr_nano must survive an empty test set")
    assert(r.getLong(2) == 0 && r.getLong(3) == 0)
    assert(r.isNullAt(4), "coverage undefined with no test rows")
  }

  test("negative labels never enter calibration or the test count") {
    val calib = (1 to 9).map(i => (i * 10L, 1, true)) ++ Seq((1L, 0, true))
    val test = Seq((50L, 1, false), (50L, 0, false))
    val r = EvalOps.conformalCoverage(scored(calib ++ test)).collect()(0)
    assert(r.getLong(0) == 9 && r.getLong(2) == 1)
  }

  private def groupScored(rows: Seq[(String, Long, Boolean)]) =
    rows.toDF("grp", "score_nano", "is_calib")

  test("grouped form: each group gets its own cutoff") {
    // group a: scores 10..90 → thr 10; group b: scores 110..190 → thr 110.
    val calib = (1 to 9).flatMap(i => Seq(("a", i * 10L, true), ("b", 100L + i * 10L, true)))
    val test = Seq(("a", 5L, false), ("a", 10L, false), ("b", 105L, false), ("b", 110L, false))
    val out = EvalOps.conformalCoverageBy(groupScored(calib ++ test)).collect()
    val byGrp = out.map(r => r.getString(0) -> r).toMap
    assert(byGrp("a").getLong(2) == 10L && byGrp("b").getLong(2) == 110L)
    assert(byGrp("a").getLong(4) == 1 && byGrp("b").getLong(4) == 1)
    // a's 105-score row would be covered under b's cutoff — but it isn't here
    assert(math.abs(byGrp("a").getDouble(5) - 0.5) < 1e-6)
  }

  test("grouped form: calib-only and test-only groups both surface") {
    val rows = Seq(
      ("conly", 10L, true), ("conly", 20L, true),
      ("tonly", 42L, false))
    val out = EvalOps.conformalCoverageBy(groupScored(rows)).collect()
    val byGrp = out.map(r => r.getString(0) -> r).toMap
    assert(byGrp("conly").getLong(3) == 0 && byGrp("conly").isNullAt(5))
    // no calibration → NULL cutoff → covers all its test rows
    assert(byGrp("tonly").getLong(1) == 0 && byGrp("tonly").isNullAt(2))
    assert(byGrp("tonly").getLong(4) == 1 && byGrp("tonly").getDouble(5) == 1.0)
  }

  test("grouped form agrees with the ungrouped operator on a single group") {
    val calib = (1 to 50).map(i => (i * 7L, 1, true))
    val test = (1 to 30).map(i => (i * 11L, 1, false))
    val single = EvalOps.conformalCoverage(scored(calib ++ test)).collect()(0)
    val grouped = EvalOps
      .conformalCoverageBy(groupScored((calib ++ test).map(t => ("g", t._1, t._3))))
      .collect()(0)
    assert(grouped.getLong(1) == single.getLong(0))
    assert(grouped.getLong(2) == single.getLong(1))
    assert(grouped.getLong(4) == single.getLong(3))
  }
}
