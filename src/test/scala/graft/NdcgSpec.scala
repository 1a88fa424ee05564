package graft

import graft.operators.SimilarityOps

/** SimilarityOps.knnRankingQuality: perfect-retrieval and zero-relevance
  * edges plus a hand-computed partial golden.
  */
class NdcgSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters far apart, labels follow the cluster: every
  // probe's top-k are all same-label → NDCG = MRR = 1
  private def separated(n: Int) =
    (0L until n.toLong).map { i =>
      val c = (i % 2).toInt
      val base = if (c == 0) 10.0 else -10.0
      (i, Seq(base + 0.001 * i, base, base, base), c)
    }.toDF("vec_id", "embedding", "label")

  test("perfectly clustered labels: mean NDCG and MRR are 1") {
    val r = SimilarityOps.knnRankingQuality(separated(60), k = 5, probeEvery = 10).collect()(0)
    assert(r.getLong(0) == 6 && r.getLong(1) == 0)
    assert(r.getDouble(2) == 1.0, s"ndcg ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0)
  }

  test("no label ever matches: zero scores, zero-rel queries counted") {
    val df = (0L until 40L)
      .map(i => (i, Seq(i.toDouble, 1.0, 0.0, 0.0), i.toInt)) // all labels distinct
      .toDF("vec_id", "embedding", "label")
    val r = SimilarityOps.knnRankingQuality(df, k = 5, probeEvery = 8).collect()(0)
    assert(r.getLong(1) == r.getLong(0))
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("hand-computed single-query golden: one hit at rank 2") {
    // probe 0; candidates ordered by cosine; exactly the rank-2 candidate
    // shares the label → DCG = 1/log2(3), IDCG = 1/log2(2) = 1, MRR = 1/2
    val df = Seq(
      (0L, Seq(1.0, 0.0), 7),
      (1L, Seq(0.999, 0.04), 1), // rank 1, label differs
      (2L, Seq(0.995, 0.09), 7), // rank 2, label matches
      (3L, Seq(0.9, 0.4), 2),
      (4L, Seq(0.8, 0.6), 3)
    ).toDF("vec_id", "embedding", "label")
    val r = SimilarityOps.knnRankingQuality(df, k = 4, probeEvery = 5).collect()(0)
    assert(r.getLong(0) == 1)
    val want = (math.log(2.0) / math.log(3.0)) // 1/log2(3)
    assert(math.abs(r.getDouble(2) - want) < 1e-6, s"ndcg ${r.getDouble(2)} vs $want")
    assert(r.getDouble(3) == 0.5)
  }

  test("IDCG normalizes by corpus-wide relevant count, not retrieved hits") {
    // probe 0 (label 7) has THREE relevant corpus vectors but k=2 retrieves
    // only the one at rank 1 — standard NDCG@2 = dn(1)/(dn(1)+dn(2)), NOT
    // the self-satisfied 1.0 a retrieved-only ideal would report
    val df = Seq(
      (0L, Seq(1.0, 0.0), 7),
      (1L, Seq(0.999, 0.04), 7), // rank 1, relevant
      (2L, Seq(0.99, 0.1), 1), // rank 2, not
      (3L, Seq(-1.0, 0.2), 7), // missed relevant (far)
      (4L, Seq(-1.0, 0.3), 7) // missed relevant (far)
    ).toDF("vec_id", "embedding", "label")
    val r = SimilarityOps.knnRankingQuality(df, k = 2, probeEvery = 5).collect()(0)
    assert(r.getLong(0) == 1 && r.getLong(1) == 0)
    val want = 1.0 / (1.0 + math.log(2.0) / math.log(3.0))
    assert(math.abs(r.getDouble(2) - want) < 1e-5, s"ndcg ${r.getDouble(2)} vs $want")
    assert(r.getDouble(3) == 1.0)
  }
}
