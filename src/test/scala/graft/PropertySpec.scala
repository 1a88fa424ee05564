package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.core.{BinMethod, BinSpec}
import graft.operators.HistogramOps

/** ScalaCheck properties (SURVEY §5.2.3) — run through scalacheck's own
  * runner inside ScalaTest (the scalatestplus bridge isn't on the offline
  * classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("BinSpec: derive is total and bins == hi - lo on sane ranges") {
    check(Prop.forAll(Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(0.0, 1000.0)) {
      (mn: Double, span: Double) =>
        val mx = mn + span
        val lin = BinSpec.derive(mn, mx, BinMethod.Linear)
        val log = BinSpec.derive(mn, mx, BinMethod.Log)
        lin.bins == lin.hi - lin.lo && lin.bins >= 20 &&
        log.bins == log.hi - log.lo && log.offset >= 0.0 &&
        (mn > 0 || log.offset == math.abs(mn) + 1)
    }, n = 100)
  }

  test("histogram mass conservation: sum(counts) == #in-range codes") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-50, 150))
    check(Prop.forAll(gen) { xs: List[Int] =>
      val df = xs.toDF("code")
      val total = HistogramOps.binCounts(df, 0, 100).agg(sum("count")).head().getLong(0)
      total == xs.count(x => x >= 0 && x <= 100)
    }, n = 15)
  }

  test("merge is commutative and preserves mass") {
    val gen = Gen.listOfN(10, Gen.chooseNum(0L, 20L))
    check(Prop.forAll(gen, gen) { (h1: List[Long], h2: List[Long]) =>
      def df(h: List[Long]) =
        h.zipWithIndex.map { case (c, b) => (b, c) }.toDF("bin", "count")
      val ab = HistogramOps.merge(df(h1), df(h2)).orderBy("bin").collect().map(_.getLong(1)).toSeq
      val ba = HistogramOps.merge(df(h2), df(h1)).orderBy("bin").collect().map(_.getLong(1)).toSeq
      ab == ba && ab.sum == h1.sum + h2.sum
    }, n = 10)
  }

  test("quantize is order-preserving over positive values (linear)") {
    val spec = BinSpec(0, 100000, 0.0, BinMethod.Linear)
    val gen = Gen.listOfN(20, Gen.chooseNum(0.0, 900.0))
    check(Prop.forAll(gen) { xs: List[Double] =>
      val sorted = xs.sorted
      val codes = sorted
        .toDF("value")
        .select(HistogramOps.quantize(col("value"), spec).as("c"))
        .collect()
        .map(_.getInt(0))
        .toSeq
      codes == codes.sorted
    }, n = 10)
  }

  test("deciles: percentiles ∈ {0..100}, counts sum to total") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(1L, 50L))
    check(Prop.forAll(gen) { counts: List[Long] =>
      val histo = counts.zipWithIndex
        .map { case (c, i) => (i.toDouble, c) }
        .toDF("value", "cnt")
      val out = graft.operators.PercentileOps.deciles(histo).collect()
      val percentiles = out.map(_.getLong(0))
      percentiles.forall(p => p >= 0 && p <= 100 && p % 10 == 0) &&
      out.map(_.getLong(3)).sum == counts.sum
    }, n = 10)
  }
}
