package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** SimilarityOps.knnPq: the ADC identity in the exact-codebook
  * degenerate, determinism, and output contract.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic integer-ish embeddings: dim 8, values in [-1, 1]
  private def embDf(n: Int) =
    (0L until n.toLong)
      .map { i =>
        val v = (0 until 8).map(d => (((i * 31 + d * 17) % 19).toDouble - 9.0) / 10.0)
        (i, v)
      }
      .toDF("vec_id", "embedding")

  test("codebook covering the corpus makes ADC the exact squared L2 ranking") {
    // ksub = n and iters = 1: every corpus subvector IS a centroid, each
    // vector encodes to itself, so the ADC sum equals the true distance.
    val n = 20
    val df = embDf(n)
    val got = SimilarityOps
      .knnPq(df, k = 5, m = 2, ksub = n, iters = 1, probeEvery = 10, dim = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1))
      .toMap
    // brute-force exact micro² L2 on the driver
    val vecs = (0L until n.toLong)
      .map(i => i -> (0 until 8).map(d => math.round(((((i * 31 + d * 17) % 19).toDouble - 9.0) / 10.0) * 1e6)))
      .toMap
    for (q <- Seq(0L, 10L)) {
      val want = vecs.keys.filter(_ != q).toSeq
        .map(c => c -> vecs(q).zip(vecs(c)).map { case (a, b) => (a - b) * (a - b) }.sum)
        .sortBy { case (c, d) => (d, c) }
        .take(5)
      want.zipWithIndex.foreach { case ((c, _), i) =>
        assert(got((q, i + 1)) == c, s"q=$q rank ${i + 1}")
      }
    }
  }

  test("adist is nonnegative and ranks are dense 1..k per query") {
    val out = SimilarityOps
      .knnPq(embDf(40), k = 7, m = 4, ksub = 8, iters = 2, probeEvery = 20, dim = 8)
      .collect()
    assert(out.forall(_.getLong(3) >= 0L))
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 7))
    }
  }

  test("deterministic across runs") {
    val r1 = SimilarityOps
      .knnPq(embDf(30), k = 5, m = 2, ksub = 4, iters = 2, probeEvery = 15, dim = 8)
      .collect().toSeq
    // drop the session-memoized ADC relation so the second call actually
    // re-fits the codebooks — without this the memo hands back the same
    // cached relation and the test compares it to itself
    graft.operators.DedupOps.releaseAllCaches()
    val r2 = SimilarityOps
      .knnPq(embDf(30), k = 5, m = 2, ksub = 4, iters = 2, probeEvery = 15, dim = 8)
      .collect().toSeq
    assert(r1 == r2)
  }

  test("pqAdc sampled-fit route (r12 verdict #1): fires over a confirmed ceiling, keys exact") {
    import graft.core.RouteLog
    val n = 1200
    val df = embDf(n)
    def cnt = RouteLog.recent().count(_.startsWith("pqAdc.sampledFit:"))
    val before = cnt
    // ksub=2 → sample target 512 < 1200, so the route genuinely subsamples
    val routed = SimilarityOps
      .pqAdc(df, m = 2, ksub = 2, iters = 2, probeEvery = 400, dim = 8,
        maxFullFitVectors = 10L)
      .collect()
    assert(cnt == before + 1, "route must fire once and announce itself")
    assert(routed.forall(_.getLong(2) >= 0L))
    // the sample changes only TRAINING: the encode/probe legs still pay the
    // full corpus, so the (q_id, c_id) key set is identical to the full fit
    val keys = routed.map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = SimilarityOps
      .pqAdc(df, m = 2, ksub = 2, iters = 2, probeEvery = 400, dim = 8)
      .collect()
    assert(cnt == before + 1, "default ceiling must not route at 1200 vectors")
    assert(full.map(r => (r.getLong(0), r.getLong(1))).toSet == keys)
    graft.operators.DedupOps.releaseAllCaches()
  }

  test("ADC dtab broadcast decision: bounded at sf scale, dropped at corpus scale") {
    // bench config (n=2000, probeEvery=50, m=8, ksub=256): 40 probes →
    // ~82k dtab rows — well under the 2^22-row broadcast ceiling
    assert(SimilarityOps.adcDtabBroadcastable(2000, 8, 256, 50))
    // 10^9-vector corpus at the same probeEvery: 2·10^7 probes →
    // ~4·10^10 dtab rows — the hint MUST be dropped (round-11 verdict #3)
    assert(!SimilarityOps.adcDtabBroadcastable(1e9, 8, 256, 50))
    // the bound is on dtab rows, not corpus rows: a huge corpus with a
    // proportionally sparse probe slice still broadcasts
    assert(SimilarityOps.adcDtabBroadcastable(1e9, 8, 256, 1000000))
  }
}
