package graft

import graft.operators.EvalOps

/** EvalOps.logRank: brute-force Mantel–Cox replay, the identical-groups
  * null, and a separated-hazards alternative.
  */
class LogRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)]) =
    EvalOps.logRank(rows.toDF("t", "ev", "g"),
      org.apache.spark.sql.functions.col("t"),
      org.apache.spark.sql.functions.col("ev"),
      org.apache.spark.sql.functions.col("g")).collect()(0)

  /** Sequential O1/E1/V fold over event times. */
  private def ref(rows: Seq[(Long, Long, Long)]): (Long, Double, Double) = {
    val ts = rows.map(_._1).distinct.sorted
    var o1 = 0L; var e1 = 0.0; var v = 0.0
    for (t <- ts) {
      val n1 = rows.count(r => r._1 >= t && r._3 == 1).toDouble
      val n0 = rows.count(r => r._1 >= t && r._3 == 0).toDouble
      val d1 = rows.count(r => r._1 == t && r._2 == 1 && r._3 == 1).toLong
      val d0 = rows.count(r => r._1 == t && r._2 == 1 && r._3 == 0).toLong
      val d = (d1 + d0).toDouble
      val n = n1 + n0
      if (d > 0) {
        o1 += d1
        e1 += d * n1 / n
        if (n > 1) v += d * n1 * n0 * (n - d) / (n * n * (n - 1))
      }
    }
    (o1, e1, v)
  }

  test("matches the sequential Mantel-Cox fold on mixed censored data") {
    val rows = (1 to 200).map { i =>
      val g = (i % 2).toLong
      val t = (((i * 13) % 17) + (if (g == 1) 3 else 0)).toLong // group 1 lives longer
      val ev = (if (i % 5 == 0) 0 else 1).toLong
      (t, ev, g)
    }
    val (o1, e1, v) = ref(rows)
    val r = run(rows)
    assert(r.getLong(2) == o1)
    assert(math.abs(r.getDouble(3) - e1) < 1e-5, s"E1 ${r.getDouble(3)} vs $e1")
    val chi2 = (o1 - e1) * (o1 - e1) / v
    assert(math.abs(r.getDouble(4) - chi2) < 1e-4, s"chi2 ${r.getDouble(4)} vs $chi2")
    assert(r.getBoolean(5) == (chi2 > 3.841))
  }

  test("identical groups: O1 == E1 and chi2 == 0") {
    // every duration appears once per group with the same event flag
    val rows = (1 to 50).flatMap { i =>
      val t = (i % 10).toLong
      val ev = (if (i % 4 == 0) 0 else 1).toLong
      Seq((t, ev, 0L), (t, ev, 1L))
    }
    val r = run(rows)
    assert(math.abs(r.getLong(2).toDouble - r.getDouble(3)) < 1e-6)
    assert(r.getDouble(4) == 0.0 && !r.getBoolean(5))
  }

  test("clearly separated hazards are detected") {
    // group 0 all die at t=1, group 1 all die at t=10
    val rows = (1 to 40).map(i => (1L, 1L, 0L)) ++ (1 to 40).map(i => (10L, 1L, 1L))
    val r = run(rows)
    assert(r.getBoolean(5), s"chi2 ${r.getDouble(4)} should clear 3.841")
  }
}
