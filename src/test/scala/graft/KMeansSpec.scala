package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, KMeansOps, TextOps}
import graft.sources.Tables

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans golden: two obvious clusters recovered") {
    // two tight groups on a 4-dim line; k=2 must separate them whatever
    // the hash picks as seeds
    val emb = Seq(
      (1L, Array(0.10f, 0.10f, 0.10f, 0.10f)),
      (2L, Array(0.11f, 0.10f, 0.10f, 0.10f)),
      (3L, Array(0.10f, 0.11f, 0.10f, 0.10f)),
      (4L, Array(0.50f, 0.50f, 0.50f, 0.50f)),
      (5L, Array(0.51f, 0.50f, 0.50f, 0.50f)),
      (6L, Array(0.50f, 0.51f, 0.50f, 0.50f)))
      .toDF("vec_id", "embedding")
    val vecs = KMeansOps.quantize(emb)
    val cents = KMeansOps.seeds(vecs, 2)
    val best = KMeansOps.assign(vecs, KMeansOps.update(vecs, KMeansOps.assign(vecs, cents)))
    val byCluster = best
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._2)
      .values
      .map(_.map(_._1).toSet)
      .toSet
    DedupOps.releaseShingleCaches()
    assert(byCluster == Set(Set(1L, 2L, 3L), Set(4L, 5L, 6L)))
  }

  test("silhouette: well-separated blobs score near 1; scores bounded in [-1, 1]") {
    val emb = Seq(
      (1L, Array(0.10f, 0.10f, 0.10f, 0.10f)),
      (2L, Array(0.11f, 0.10f, 0.10f, 0.10f)),
      (3L, Array(0.10f, 0.11f, 0.10f, 0.10f)),
      (4L, Array(0.90f, 0.90f, 0.90f, 0.90f)),
      (5L, Array(0.91f, 0.90f, 0.90f, 0.90f)),
      (6L, Array(0.90f, 0.91f, 0.90f, 0.90f)))
      .toDF("vec_id", "embedding")
    val rows = KMeansOps.silhouetteSummary(emb, k = 2, iters = 2).collect()
    DedupOps.releaseShingleCaches()
    assert(rows.length == 2 && rows.map(_.getLong(1)).sum == 6L)
    assert(rows.forall(_.getDouble(2) > 0.9),
      s"separated blobs must score near 1: ${rows.mkString(",")}")
    val sf = KMeansOps.silhouetteSummary(
      Tables.embeddings(spark, TestSpark.sf0001), k = 8, iters = 2).collect()
    DedupOps.releaseShingleCaches()
    assert(sf.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
  }

  test("kmeans is partitioning-invariant (exact integer arithmetic)") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val a = KMeansOps.fitSummary(emb, k = 8, iters = 2).collect().toSeq
    DedupOps.releaseShingleCaches()
    val b = KMeansOps.fitSummary(emb.repartition(7), k = 8, iters = 2).collect().toSeq
    DedupOps.releaseShingleCaches()
    assert(a == b)
    assert(a.map(_.getLong(1)).sum == emb.count())
    assert(a.forall(_.getLong(2) >= 0L))
  }

  test("kmeans iterations do not increase inertia") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    def inertia(iters: Int): Long = {
      val s = KMeansOps.fitSummary(emb, k = 8, iters = iters).collect()
      DedupOps.releaseShingleCaches()
      s.map(_.getLong(2)).sum
    }
    val i1 = inertia(1)
    val i2 = inertia(2)
    val i3 = inertia(3)
    assert(i2 <= i1, s"iter2 $i2 > iter1 $i1")
    assert(i3 <= i2, s"iter3 $i3 > iter2 $i2")
  }

  test("prototypeSummary: keep fraction exact, kept+pruned distance equals inertia") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val proto = KMeansOps.prototypeSummary(emb, k = 8, iters = 2).collect()
    DedupOps.releaseShingleCaches()
    val summary = KMeansOps.fitSummary(emb, k = 8, iters = 2).collect()
    DedupOps.releaseShingleCaches()
    val inertia = summary.map(r => r.getInt(0) -> r.getLong(2)).toMap
    val sizes = summary.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(proto.length == summary.length)
    proto.foreach { r =>
      val (cid, n, keep, kept, pruned) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n == sizes(cid))
      assert(keep == math.max(1L, n * 3 / 4))
      // the cut partitions the cluster's distance mass exactly
      assert(kept + pruned == inertia(cid))
      // kept side holds the CLOSEST members: its mean can't exceed the
      // pruned side's mean (strict ranking by distance)
      if (n > keep)
        assert(kept.toDouble / keep <= pruned.toDouble / (n - keep) + 1e-9)
    }
  }

  test("sampled-fit route (r12 verdict #1): pure decision boundaries") {
    // routes only when BOTH the ceiling and the sample target are exceeded
    assert(KMeansOps.shouldSampleFit(100001L, 4))
    assert(!KMeansOps.shouldSampleFit(100000L, 4))
    assert(!KMeansOps.shouldSampleFit(0L, 4))
    // a corpus no larger than the sample target never routes, whatever
    // the ceiling — a "sample" of everything is the full fit
    assert(!KMeansOps.shouldSampleFit(200L, 1, maxFullFit = 10L))
    assert(KMeansOps.shouldSampleFit(300L, 1, maxFullFit = 10L))
    assert(KMeansOps.sampleTarget(64) == 256L * 64)
  }

  test("sampled-fit route fires above a confirmed ceiling and equals the full fit on the sample") {
    import graft.core.RouteLog
    import graft.functions.PortableHash
    val n = 1200
    val emb = (0L until n.toLong).map { i =>
      val v = (0 until 4).map(d => (((i * 13 + d * 7) % 21).toDouble - 10.0) / 20.0)
      (i, v)
    }.toDF("vec_id", "embedding")
    val k = 2
    def count(route: String) = RouteLog.recent().count(_.startsWith(s"$route:"))
    val before = count("fitCentroids.sampledFit")
    val routed = KMeansOps
      .fitCentroids(emb, k, iters = 2, maxFullFitVectors = 10L)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSet
    assert(count("fitCentroids.sampledFit") == before + 1, "route must fire and announce itself")
    // manual twin: the UNROUTED full fit on exactly the hash-sample subset
    // must be bit-identical (quantize and the hash filter commute)
    val every = math.max(1L, n.toLong / KMeansOps.sampleTarget(k))
    assert(every >= 2, "fixture must actually subsample")
    val subset = emb.filter(
      pmod(
        PortableHash.hash60(concat(lit("kms:"), col("vec_id").cast("string"))),
        lit(every)) === 0)
    val nSub = subset.count()
    assert(nSub > 0 && nSub < n)
    val manual = KMeansOps
      .fitCentroids(subset, k, iters = 2)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSet
    DedupOps.releaseShingleCaches()
    assert(routed == manual)
    // below the default ceiling nothing routes — the oracle path is the
    // bit-exact full fit
    val quiet = count("fitCentroids.sampledFit")
    KMeansOps.fitCentroids(emb, k, iters = 1).count()
    DedupOps.releaseShingleCaches()
    assert(count("fitCentroids.sampledFit") == quiet)
  }

  test("unigram NLL: uniform corpus scores ln(vocab), rare tokens score higher") {
    val docs = Seq(
      (1L, "aa bb cc dd"),
      (2L, "aa bb cc dd"),
      (3L, "aa bb cc rare"))
      .toDF("doc_id", "text")
    val got = TextOps
      .unigramNll(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // N=12; docs 1,2: tokens n_w = 3,3,3,2 → same score; doc 3 has 'rare'
    // (n_w=1) → strictly higher NLL
    assert(got(0)._3 == got(1)._3)
    assert(got(2)._3 > got(0)._3)
    val expected1 = math.log(12.0) - (3 * math.log(3.0) + math.log(2.0)) / 4.0
    assert(math.abs(got(0)._3 - expected1) < 1e-5)
  }
}
