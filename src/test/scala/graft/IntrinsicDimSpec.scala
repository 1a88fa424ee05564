package graft

import graft.operators.SimilarityOps

/** SimilarityOps.intrinsicDim: TwoNN recovers low intrinsic dimension on
  * manifold data, reads near-ambient on full-rank noise, and handles the
  * all-duplicates degenerate.
  */
class IntrinsicDimSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Double])]) = rows.toDF("vec_id", "embedding")

  test("1-D curve embedded in 8 dims estimates d near 1") {
    // irregularly-spaced points along a line direction (irregular so the
    // r2/r1 ratios are informative, not lattice-degenerate)
    val rows = (0L until 300L).map { i =>
      val t = i.toDouble + math.sin(i.toDouble * 1.7) * 0.4
      (i, Seq(t * 0.01, t * 0.02, t * -0.015, t * 0.005, 0.0, 0.0, 0.0, 0.0))
    }
    val r = SimilarityOps.intrinsicDim(df(rows), probeEvery = 3).collect()(0)
    val d = r.getDouble(2)
    assert(d > 0.4 && d < 2.0, s"1-D manifold: got $d")
  }

  test("full-rank pseudo-noise estimates well above the 1-D manifold") {
    // per-dim multiplicative mixing so coordinates are pseudo-independent
    // (an additive k-shift would make every dim an affine copy — rank 1)
    val primes = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L,
      374761393L, 2127912214L, 2048144777L, 1609587929L)
    val rows = (0L until 300L).map { i =>
      (i, (0 until 8).map(k => (((i + 17) * primes(k)) % 100003L).toDouble / 100003.0 - 0.5))
    }
    val r = SimilarityOps.intrinsicDim(df(rows), probeEvery = 3).collect()(0)
    val d = r.getDouble(2)
    assert(d > 3.0, s"8-dim noise: got $d")
  }

  test("duplicate probes are excluded and counted; all-dup yields null") {
    val rows = (0L until 40L).map(i => (i, Seq(1.0, 2.0, 3.0, 4.0)))
    val r = SimilarityOps.intrinsicDim(df(rows), probeEvery = 2).collect()(0)
    assert(r.getLong(0) == 0)
    assert(r.getLong(1) == 20)
    assert(r.isNullAt(2))
  }
}
