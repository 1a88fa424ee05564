package graft

import graft.operators.EvalOps

/** EvalOps.cuped: θ recovers the true pre/post coefficient, the adjusted
  * delta strips covariate imbalance, and ρ² reports the attainable
  * variance reduction.
  */
class CupedSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly correlated covariate: theta exact, imbalance fully removed") {
    // y = 3x exactly; arm 0 happens to draw larger x, so the raw delta is
    // pure covariate imbalance — CUPED must zero it.
    val rows = (1 to 100).map { i =>
      val arm = (i % 2).toLong
      val x = (if (arm == 0) 100 + i else i).toLong
      (arm, x, 3 * x)
    }
    val r = EvalOps.cuped(rows.toDF("arm", "x", "y")).collect()(0)
    assert(r.getLong(0) == 50 && r.getLong(1) == 50)
    assert(r.getDouble(2) == 3.0, s"theta ${r.getDouble(2)}")
    // x imbalance: mean_a = 100 + mean(2,4..100) = 151, mean_b = mean(1,3..99) = 50
    assert(math.abs(r.getDouble(3) - 3.0 * 101.0) < 1e-6)
    assert(math.abs(r.getDouble(4)) < 1e-6, s"cuped delta ${r.getDouble(4)}")
    assert(r.getDouble(5) == 1.0) // rho² = 1 for an exact linear relation
  }

  test("true treatment effect survives the adjustment") {
    // y = 2x + 5·[arm=0] + deterministic noise independent of x; the
    // effect is small next to Var(2x), so pooled rho² stays near 1
    val rows = (1 to 400).map { i =>
      val arm = (i % 2).toLong
      val x = ((i * 13) % 97).toLong
      val noise = ((i * 7) % 11).toLong - 5
      (arm, x, 2 * x + (if (arm == 0) 5L else 0L) + noise)
    }
    val r = EvalOps.cuped(rows.toDF("arm", "x", "y")).collect()(0)
    assert(math.abs(r.getDouble(2) - 2.0) < 0.05, s"theta ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(4) - 5.0) < 2.0, s"cuped delta ${r.getDouble(4)}")
    assert(r.getDouble(5) > 0.99, s"rho2 ${r.getDouble(5)}")
  }

  test("postStratifiedDiff: pure composition noise is removed entirely") {
    // within every stratum both arms average the same; arm 0 just has
    // more "high" stratum rows → raw diff > 0, stratified diff = 0
    val rows =
      Seq.fill(80)((0L, "high", 1000L)) ++ Seq.fill(20)((0L, "low", 100L)) ++
        Seq.fill(20)((1L, "high", 1000L)) ++ Seq.fill(80)((1L, "low", 100L))
    val r = EvalOps.postStratifiedDiff(rows.toDF("arm", "stratum", "cents")).collect()(0)
    assert(r.getLong(2) == 2 && r.getLong(3) == 0)
    assert(r.getDouble(4) > 500.0, s"raw ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5)) < 1e-6, s"stratified ${r.getDouble(5)}")
  }

  test("postStratifiedDiff: a real within-stratum effect survives") {
    val rows =
      Seq.fill(50)((0L, "s1", 150L)) ++ Seq.fill(50)((1L, "s1", 100L)) ++
        Seq.fill(50)((0L, "s2", 250L)) ++ Seq.fill(50)((1L, "s2", 200L))
    val r = EvalOps.postStratifiedDiff(rows.toDF("arm", "stratum", "cents")).collect()(0)
    assert(math.abs(r.getDouble(4) - 50.0) < 1e-6)
    assert(math.abs(r.getDouble(5) - 50.0) < 1e-6)
  }

  test("postStratifiedDiff: one-armed strata are skipped and counted") {
    val rows = Seq.fill(30)((0L, "both", 100L)) ++ Seq.fill(30)((1L, "both", 80L)) ++
      Seq.fill(10)((0L, "aonly", 999L))
    val r = EvalOps.postStratifiedDiff(rows.toDF("arm", "stratum", "cents")).collect()(0)
    assert(r.getLong(2) == 1 && r.getLong(3) == 1)
    // stratified estimate uses only the usable stratum, weighted by its pooled share
    assert(math.abs(r.getDouble(5) - (60.0 / 70.0) * 20.0) < 1e-6)
  }

  test("uncorrelated covariate: theta ~ 0, adjustment leaves the delta alone") {
    val rows = (1 to 200).map { i =>
      val arm = (i % 2).toLong
      val x = ((i * 31) % 7).toLong
      val y = ((i * 17) % 13).toLong + (if (arm == 0) 100L else 0L)
      (arm, x, y)
    }
    val r = EvalOps.cuped(rows.toDF("arm", "x", "y")).collect()(0)
    assert(math.abs(r.getDouble(3) - r.getDouble(4)) < math.abs(r.getDouble(3)) * 0.2)
    assert(r.getDouble(5) < 0.05, s"rho2 ${r.getDouble(5)}")
  }
}
