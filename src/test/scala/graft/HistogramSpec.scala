package graft

import org.apache.spark.sql.functions._

import graft.core.{BinMethod, BinSpec}
import graft.operators.{HistogramOps, PercentileOps}

/** Golden fixtures ported verbatim from the reference unit tests
  * (reference: test/test_histogram.py:5-28) plus BinSpec derivation and
  * pipeline invariants.
  */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  // reference test/test_histogram.py:5 — 3×3 matrix flattened
  private val fixture = Seq(1, 2, 3, 2, 3, 4, 3, 4, 5)

  private def denseCounts(lo: Int, hi: Int): Seq[Long] = {
    val codes = fixture.toDF("code")
    HistogramOps
      .binCounts(codes, lo, hi)
      .orderBy("bin")
      .collect()
      .map(_.getLong(1))
      .toSeq
  }

  test("golden: histogram range (0,6) == [0,1,2,3,2,1]") {
    assert(denseCounts(0, 6) == Seq(0L, 1L, 2L, 3L, 2L, 1L))
  }

  test("golden: histogram range (0,9) == [0,1,2,3,2,1,0,0,0]") {
    assert(denseCounts(0, 9) == Seq(0L, 1L, 2L, 3L, 2L, 1L, 0L, 0L, 0L))
  }

  test("golden: histogram merge is element-wise add") {
    // reference test/test_histogram.py:23-28
    val h1 = Seq(0L, 1L, 2L, 3L, 2L, 1L, 0L, 0L, 0L)
    val h2 = Seq(1L, 2L, 1L, 2L, 0L, 0L, 1L, 1L, 1L)
    val df1 = h1.zipWithIndex.map { case (c, b) => (b, c) }.toDF("bin", "count")
    val df2 = h2.zipWithIndex.map { case (c, b) => (b, c) }.toDF("bin", "count")
    val merged = HistogramOps
      .merge(df1, df2)
      .orderBy("bin")
      .collect()
      .map(_.getLong(1))
      .toSeq
    assert(merged == Seq(1L, 3L, 3L, 5L, 2L, 1L, 1L, 1L, 1L))
  }

  test("np.histogram closed last bin: code == hi lands in bin hi-1") {
    val codes = Seq(0, 1, 5, 6).toDF("code") // range (0,6): 6 == hi
    val counts = HistogramOps
      .binCounts(codes, 0, 6)
      .orderBy("bin")
      .collect()
      .map(_.getLong(1))
      .toSeq
    assert(counts == Seq(1L, 1L, 0L, 0L, 0L, 2L)) // 5 and 6 both in last bin
  }

  test("out-of-range codes are dropped (numpy range semantics)") {
    val codes = Seq(-1, 0, 3, 7, 100).toDF("code")
    val total = HistogramOps.binCounts(codes, 0, 6).agg(sum("count")).head().getLong(0)
    assert(total == 2L) // only 0 and 3 in [0, 6]
  }

  test("BinSpec linear derivation matches get_range") {
    // main.py:161-165: (int(min*100) - 10, int(max*100) + 10)
    val s = BinSpec.derive(1.0, 50.0, BinMethod.Linear)
    assert(s == BinSpec(90, 5010, 0.0, BinMethod.Linear))
    // negative min truncates toward zero like Python int()
    val n = BinSpec.derive(-1.237, 2.5, BinMethod.Linear)
    assert(n.lo == -123 - 10 && n.hi == 250 + 10)
  }

  test("BinSpec log derivation: offset rule and truncation") {
    // min > 0 → offset 0 (main.py:166-168)
    val pos = BinSpec.derive(0.01, 490.02, BinMethod.Log)
    assert(pos.offset == 0.0)
    assert(pos.lo == (math.log(0.01) * 1000).toInt) // -4605 (toward zero)
    assert(pos.lo == -4605)
    // min ≤ 0 → offset = |min| + 1
    val neg = BinSpec.derive(-249.99, 240.02, BinMethod.Log)
    assert(neg.offset == 249.99 + 1)
    assert(neg.lo == (math.log(-249.99 + 250.99) * 1000).toInt)
  }

  test("histogram counts sum to the number of in-range values") {
    val values = HistogramOps.validValues(
      spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet"),
      "l_quantity")
    val n = values.count()
    val spec = {
      val (mn, mx) = HistogramOps.minMax(values)
      BinSpec.derive(mn, mx, BinMethod.Linear)
    }
    val histo = HistogramOps.histogram(values, spec)
    assert(histo.agg(sum("cnt")).head().getLong(0) == n) // linear pad → nothing dropped
    assert(histo.count() == spec.bins.toLong) // dense: one row per bin
  }

  test("quantize truncates toward zero, matching numpy astype") {
    val spec = BinSpec(-1000, 1000, 0.0, BinMethod.Linear)
    val got = Seq(1.237, -1.237, 0.999, -0.999)
      .toDF("value")
      .select(HistogramOps.quantize(col("value"), spec).as("code"))
      .collect()
      .map(_.getInt(0))
      .toSeq
    assert(got == Seq(123, -123, 99, -99))
  }

  test("dense-vector aggregator histogram == group-by histogram") {
    val values = HistogramOps.validValues(
      spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet"),
      "l_quantity")
    val (mn, mx) = HistogramOps.minMax(values)
    val spec = BinSpec.derive(mn, mx, BinMethod.Linear)
    val a = HistogramOps.histogram(values, spec).collect().toSeq
    val b = HistogramOps.histogramDense(values, spec).collect().toSeq
    assert(a == b)
  }

  test("deciles DataFrame form == SQL-verbatim form") {
    val values = HistogramOps.validValues(
      spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet"),
      "l_quantity")
    val (mn, mx) = HistogramOps.minMax(values)
    val histo = HistogramOps.histogram(values, BinSpec.derive(mn, mx, BinMethod.Linear))
    val a = PercentileOps.deciles(histo).collect().toSeq
    val b = PercentileOps.decilesSql(spark, histo).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // last cumulative row: running == total → pct 10 → percentile 100
    assert(a.map(_.getLong(0)).max == 100L)
  }
}
