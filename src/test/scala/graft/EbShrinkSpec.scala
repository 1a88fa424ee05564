package graft

import graft.operators.EvalOps

/** EvalOps.ebShrinkRates: shrinkage direction and ordering, the
  * binomially-consistent complete-pooling degenerate, and the
  * maximally-dispersed no-pooling edge.
  */
class EbShrinkSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    EvalOps.ebShrinkRates(rows.toDF("grp", "n", "x")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4), if (r.isNullAt(6)) None else Some(r.getDouble(6)))))
      .toMap

  test("overdispersed groups shrink toward the pool, small n shrinks more") {
    // two big anchors far apart create real overdispersion; two small
    // groups at the same raw rate should land between raw and pooled,
    // the smaller one closer to the pool.
    val rows = Seq(
      ("big_lo", 10000L, 1000L), ("big_hi", 10000L, 5000L),
      ("small", 20L, 12L), ("tiny", 5L, 3L))
    val out = run(rows)
    val pooled = (1000.0 + 5000 + 12 + 3) / (10000 + 10000 + 20 + 5)
    val (_, rawS, shrS, _) = out("small")
    val (_, rawT, shrT, _) = out("tiny")
    assert(rawS == 0.6 && rawT == 0.6)
    assert(shrS > pooled && shrS < rawS, s"small: $shrS")
    assert(shrT > pooled && shrT < rawT, s"tiny: $shrT")
    assert(shrT < shrS, "smaller group must be pulled harder")
  }

  test("binomially consistent groups pool completely (null prior)") {
    // identical rates: between-group variance is ~0 < binomial floor
    val rows = Seq(("a", 100L, 30L), ("b", 200L, 60L), ("c", 400L, 120L))
    val out = run(rows)
    out.values.foreach { case (_, _, shr, prior) =>
      assert(prior.isEmpty)
      assert(math.abs(shr - 0.3) < 1e-6)
    }
  }

  test("single group pools to itself") {
    val out = run(Seq(("only", 50L, 10L)))
    val (_, raw, shr, prior) = out("only")
    assert(prior.isEmpty && raw == 0.2 && shr == 0.2)
  }
}
