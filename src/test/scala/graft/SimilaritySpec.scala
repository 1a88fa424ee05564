package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.SimilarityOps
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = {
    SparkEntry.tune(spark)
    SimilarityOps.corpus(Tables.embeddings(spark, TestSpark.sf0001))
  }

  test("native cosine expression == higher-order-function reference") {
    val pairs = emb
      .toDF("a_id", "a")
      .crossJoin(emb.toDF("b_id", "b"))
      .filter(col("a_id") < col("b_id") && col("a_id") < 30 && col("b_id") < 30)
      .select(
        GraftFunctions.cosine(col("a"), col("b")).as("native"),
        GraftFunctions.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("cosine golden values") {
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0), 1.0),
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(1.0, 2.0), Array(2.0, 4.0), 1.0),
      (Array(1.0, 0.0), Array(-1.0, 0.0), -1.0)).toDF("a", "b", "want")
    df.select(GraftFunctions.cosine(col("a"), col("b")).as("got"), col("want"))
      .collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("cosine of zero vector is null") {
    val r = Seq((Array(0.0, 0.0), Array(1.0, 2.0)))
      .toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b")))
      .head()
    assert(r.isNullAt(0))
  }

  test("brute-force knn: ranks are 1..k, no self-match, descending cosine") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val knn = SimilarityOps.knnBruteForce(q, emb, 10).collect()
    val byQ = knn.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getInt(2)).toSeq == (1 to rows.length))
      assert(!rows.exists(_.getLong(1) == qid))
      val cosines = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH knn: results are a subset-ranking with reasonable top-1 agreement") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = SimilarityOps
      .knnBruteForce(q, emb, 10)
      .filter(col("rank") === 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val lsh = SimilarityOps
      .knnLsh(q, emb, 10, numPlanes = 4, dim = 64)
      .filter(col("rank") === 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(lsh.nonEmpty)
    // ANN: same-bucket top-1 should agree with exact top-1 for a decent
    // fraction of queries (these are random vectors — weak structure)
    val agree = exact.keySet.intersect(lsh.keySet).count(k => exact(k) == lsh(k))
    assert(agree >= 1, s"LSH top-1 agreement $agree/${lsh.size}")
  }

  test("IVF knn: recall@10 vs brute force with nprobe=4/nlist=16") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .groupBy(_.getLong(0))
        .view
        .mapValues(_.map(_.getLong(1)).toSet)
        .toMap
    val exact = topSets(SimilarityOps.knnBruteForce(q, emb, 10))
    val ivf = topSets(SimilarityOps.knnIvf(q, emb, 10, nlist = 16, nprobe = 4))
    assert(ivf.nonEmpty)
    val recalls = exact.keys.toSeq.map { qid =>
      val found = ivf.getOrElse(qid, Set.empty)
      exact(qid).intersect(found).size.toDouble / exact(qid).size
    }
    val meanRecall = recalls.sum / recalls.size
    // random 64-dim vectors are a worst case for IVF; a quarter of the
    // corpus probed should still recover a substantial share
    assert(meanRecall >= 0.3, s"mean recall@10 = $meanRecall")
  }

  test("knnAuto dispatches on the Catalyst size estimate") {
    val e = SimilarityOps.corpus(Tables.embeddings(spark, TestSpark.sf0001))
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0)
    // generous threshold → brute force, byte-identical
    val small = SimilarityOps.knnAuto(q, e, k = 5, bruteForceMaxBytes = Long.MaxValue)
    assert(small.collect().toSeq == SimilarityOps.knnBruteForce(q, e, k = 5).collect().toSeq)
    // zero threshold → IVF path with the same derived sizing; the
    // exact→approximate dispatch must announce the contract change
    val bytes = e.queryExecution.optimizedPlan.stats.sizeInBytes
    val nlist = math.max(16, math.sqrt((bytes / (8 + 8 * 64)).toDouble).toInt)
    val warnsBefore = graft.core.RouteLog.recent().count(_.startsWith("knnAuto.ivfRoute:"))
    val big = SimilarityOps.knnAuto(q, e, k = 5, bruteForceMaxBytes = 0L)
    assert(graft.core.RouteLog.recent().count(_.startsWith("knnAuto.ivfRoute:"))
      == warnsBefore + 1)
    assert(
      big.collect().toSeq ==
        SimilarityOps
          .knnIvf(q, e, k = 5, nlist = nlist, nprobe = math.max(4, nlist / 16))
          .collect()
          .toSeq)
  }

  test("knnRerank: full-shortlist run == brute force exactly; SQ8 recall reasonable") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val n = emb.count().toInt
    val full = SimilarityOps.knnRerank(q, emb, k = 10, rerank = n).collect()
    val bf = SimilarityOps.knnBruteForce(q, emb, k = 10).collect()
    assert(full.map(_.toSeq).toSeq == bf.map(_.toSeq).toSeq,
      "rerank over the whole corpus must reproduce brute force bit-exactly")
    // the production shape: 50-candidate shortlist keeps most of the true
    // top-10 (SQ8 integer dots are a faithful ranking proxy)
    val short = SimilarityOps.knnRerank(q, emb, k = 10, rerank = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bfSet = bf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = short.intersect(bfSet).size.toDouble / bfSet.size
    assert(recall >= 0.8, s"SQ8 shortlist recall@10 too low: $recall")
  }

  test("knnRerank routes the coarse stage to trained IVF lists above maxExactVectors") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val tag = "knnRerank.ivfShortlist:"
    // default ceiling → exact SQ8 cross join, no contract-change announcement
    val before = graft.core.RouteLog.recent().count(_.startsWith(tag))
    SimilarityOps.knnRerank(q, emb, k = 10, rerank = 50).collect()
    assert(graft.core.RouteLog.recent().count(_.startsWith(tag)) == before,
      "the exact coarse stage must not announce a route")
    // forced-low ceiling → IVF-probed shortlist, announced at WARN
    val routed = SimilarityOps
      .knnRerank(q, emb, k = 10, rerank = 50, maxExactVectors = 1L)
      .collect()
    assert(graft.core.RouteLog.recent().count(_.startsWith(tag)) == before + 1,
      "the routed coarse stage must announce the recall contract change")
    // shape + determinism of the routed output
    assert(routed.nonEmpty)
    val again = SimilarityOps
      .knnRerank(q, emb, k = 10, rerank = 50, maxExactVectors = 1L)
      .collect()
    assert(routed.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // the exact rerank stage is unchanged: every routed (q, c, cos) row
    // carries the same exact cosine brute force computes for that pair
    val bf = SimilarityOps.knnBruteForce(q, emb, k = emb.count().toInt).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    routed.foreach { r =>
      assert(bf((r.getLong(0), r.getLong(1))) == r.getDouble(3))
    }
    // recall vs the true top-10 stays useful at nprobe/nlist = 4/16 on
    // random 64-dim vectors (the knnIvf spec's own floor)
    val bfTop = SimilarityOps.knnBruteForce(q, emb, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = routed.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(bfTop).size.toDouble / bfTop.size
    assert(recall >= 0.3, s"routed rerank recall@10 = $recall")
  }

  test("semanticDedup: intra-cluster pairs are a subset of the exact all-pairs set") {
    val raw = Tables.embeddings(spark, TestSpark.sf0001)
    val sem = SimilarityOps
      .semanticDedup(raw, k = 4, iters = 2, minCos = 0.3)
      .collect()
    assert(sem.length == 4) // every cluster summarized, even pair-free ones
    val nVecs = sem.map(_.getLong(1)).sum
    assert(nVecs == raw.count()) // partition of the corpus
    sem.foreach { r =>
      val (pairs, dropped) = (r.getLong(2), r.getLong(3))
      assert(dropped <= pairs) // each drop is justified by >= 1 pair
      assert(dropped <= r.getLong(1)) // can't drop more than the cluster
    }
    // clustering only PRUNES candidates: the intra-cluster pair count is
    // bounded by the exact all-pairs count at the same threshold
    val exact = SimilarityOps.nearDupPairs(raw, minCos = 0.3).count()
    assert(sem.map(_.getLong(2)).sum <= exact)
  }

  test("LshBandBuckets kernel == per-band column expression") {
    val got = emb.limit(40).select(
      col("vec_id"),
      GraftFunctions.lshBandBuckets(col("emb"), 20, 6, 64).as("kern"),
      array((0 until 20).map(b => SimilarityOps.bandBucket(col("emb"), b, 6, 64)): _*)
        .as("cols"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"vec ${r.getLong(0)}")
    }
  }

  test("knnIvfTrained: probing every list == exact brute-force L2; partial probes recall") {
    val raw = Tables.embeddings(spark, TestSpark.sf0001)
    // nprobe = nlist searches the whole corpus in the exact metric → the
    // trained-IVF pipeline must reproduce brute force row for row
    val full = SimilarityOps
      .knnIvfTrained(raw, k = 5, nlist = 8, iters = 2, nprobe = 8, probeEvery = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    val brute = SimilarityOps.knnBruteForceL2(raw, k = 5, probeEvery = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    assert(full == brute, "full-probe trained IVF must equal exact search")
    // partial probes: dense ranks, nonneg distances, reasonable recall
    val part = SimilarityOps
      .knnIvfTrained(raw, k = 5, nlist = 8, iters = 2, nprobe = 4, probeEvery = 50)
      .collect()
    assert(part.forall(_.getLong(3) >= 0L))
    part.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length))
    }
    val bruteSet = brute.map(r => (r._1, r._2)).toSet
    val hits = part.count(r => bruteSet((r.getLong(0), r.getLong(1))))
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.3, s"nprobe=4/8 recall $recall suspiciously low")
  }

  test("nearDupPairs: size-routes to the LSH path above the vector-count threshold") {
    val raw = Tables.embeddings(spark, TestSpark.sf0001)
    // sf0.001 = 500 vectors: far under the 10^5 default → exact path
    assert(!SimilarityOps.shouldRouteLsh(SimilarityOps.corpus(raw)),
      "500-vector corpus must stay on the exact kernel at the default threshold")
    // forced-low threshold → the routing estimate exceeds it → LSH route.
    // The routed call must return the IDENTICAL session-memoized relation a
    // direct nearDupPairsLsh call at the documented route config returns —
    // reference equality pins that the route really is the LSH path, not a
    // lookalike.
    assert(SimilarityOps.shouldRouteLsh(SimilarityOps.corpus(raw), maxExactVectors = 10))
    val warnsBefore = graft.core.RouteLog.recent()
      .count(_.startsWith("nearDupPairs.lshRoute:"))
    val routed = SimilarityOps.nearDupPairs(raw, minCos = 0.4, maxExactVectors = 10)
    // r12 advice #1: the contract change (exact → LSH subset) must be
    // announced, not silent
    assert(graft.core.RouteLog.recent().count(_.startsWith("nearDupPairs.lshRoute:"))
      == warnsBefore + 1, "LSH route must announce the contract change")
    val direct = SimilarityOps.nearDupPairsLsh(raw, minCos = 0.4,
      bands = 20, planesPerBand = 6, dim = 64)
    assert(routed eq direct, "route must land on the shared LSH relation")
    // explicit blocks > 0 overrides the route: exact blocked output
    val exact = SimilarityOps.nearDupPairs(raw, minCos = 0.4, blocks = 4,
      maxExactVectors = 10).count()
    assert(routed.count() <= exact, "LSH route must be a subset of exact")
    // banding adapts to the threshold: sharp at near-dup thresholds
    // (~1 % background collisions), wider below so threshold-edge recall
    // stays >= ~0.8 (tier analysis in the routeBanding scaladoc)
    assert(SimilarityOps.routeBanding(0.4) == (20, 6))
    assert(SimilarityOps.routeBanding(0.75) == (16, 8))
    assert(SimilarityOps.routeBanding(0.9) == (12, 10))
    val routedHi = SimilarityOps.nearDupPairs(raw, minCos = 0.9, maxExactVectors = 10)
    val directHi = SimilarityOps.nearDupPairsLsh(raw, minCos = 0.9,
      bands = 12, planesPerBand = 10, dim = 64)
    assert(routedHi eq directHi, "high-threshold route must use the sharp banding")
  }

  test("nearDupPairsLsh: subset of exact pairs, lossless on planted near-dups") {
    val raw = Tables.embeddings(spark, TestSpark.sf0001)
    // plant two near-identical copies of vector 0 (tiny perturbation →
    // cos ≈ 1): a REAL near-dup must survive the banded prefilter
    val base = raw.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val planted = Seq(
      (90001L, base.map(x => x + 0.001f), 0),
      (90002L, base.map(x => x * 1.01f), 0))
      .toDF("vec_id", "embedding", "label")
    val corpus = raw.select(col("vec_id"), col("embedding"), col("label")).union(planted)
    val lsh = SimilarityOps
      .nearDupPairsLsh(corpus, minCos = 0.4, bands = 20, planesPerBand = 6, dim = 64)
      .collect()
    val exact = SimilarityOps.nearDupPairs(corpus, minCos = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // every LSH pair appears in the exact output with the identical cosine
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.contains(key), s"LSH pair $key not in exact output")
      assert(exact(key) == r.getDouble(2), s"cos mismatch at $key")
    }
    assert(lsh.length <= exact.size)
    // the planted cos≈1 pairs are found (the favorable-regime guarantee)
    val got = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 90001L)) && got.contains((0L, 90002L)) &&
      got.contains((90001L, 90002L)),
      s"planted near-dups missing from $got")
    // candidate volume is genuinely below all-pairs
    val n = corpus.count()
    val cand = SimilarityOps
      .lshCandidates(SimilarityOps.corpus(corpus), bands = 20, planesPerBand = 6, dim = 64)
      .count()
    assert(cand < n * (n - 1) / 2,
      s"candidates $cand not below all-pairs ${n * (n - 1) / 2}")
  }

  test("semanticDedup cluster sizes agree with fitSummary") {
    val raw = Tables.embeddings(spark, TestSpark.sf0001)
    val sem = SimilarityOps
      .semanticDedup(raw, k = 4, iters = 2, minCos = 0.3)
      .select(col("cluster_id"), col("n_vecs"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val km = graft.operators.KMeansOps
      .fitSummary(raw, k = 4, iters = 2)
      .select(col("cluster_id"), col("n_vecs"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(sem == km)
  }

  test("kcenterCoreset == brute-force greedy replay; covers planted far points") {
    // 2-D golden: three tight clusters + the origin seed — greedy must
    // alternate across clusters before densifying
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)),
      (10L, Array(100.0f, 0.0f)), (11L, Array(100.1f, 0.0f)),
      (20L, Array(0.0f, 80.0f)), (21L, Array(0.1f, 80.0f)))
    val df = pts.map { case (id, e) => (id, e, 0) }.toDF("vec_id", "embedding", "label")
    val got = graft.operators.TrainsetOps.kcenterCoreset(df, k = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // seed = min id (0); farthest from 0 is 100-cluster (10 before 11 on
    // tie? 10 strictly farther than 11? |100.1| > |100| so 11); then the
    // 80-cluster; then the farthest remaining — replay brute force:
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        val (xi, yi) = (math.round(x * 1e6).toDouble, math.round(y * 1e6).toDouble)
        (xi - yi) * (xi - yi)
      }.sum
    var centers = Vector(pts.head)
    var expect = Vector(0L)
    for (_ <- 1 until 4) {
      val far = pts
        .map(p => (p, centers.map(c => d2(p._2, c._2)).min))
        .sortBy { case ((id, _), md) => (-md, id) }
        .head._1
      centers = centers :+ far
      expect = expect :+ far._1
    }
    assert(got.map(_._2).toSeq == expect, s"selection ${got.toSeq} != replay $expect")
    assert(got.map(_._1).toSeq == (0 until 4))
    graft.operators.DedupOps.releaseAllCaches()
  }

  test("semanticLeakage: planted cross-split near-dup is counted, totals partition") {
    val raw = Tables.embeddings(spark, TestSpark.sf0001)
    val out = SimilarityOps
      .semanticLeakage(raw, minCos = 0.4, bands = 20, planesPerBand = 6, dim = 64)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("test", "val"))
    val splits = raw.select(
      graft.operators.TextOps.splitExpr(col("vec_id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) == splits(r.getString(0)), "n_eval must equal the split size")
      assert(r.getLong(2) <= r.getLong(1))
    }
    graft.operators.DedupOps.releaseAllCaches()
  }

  test("approx deciles track exact deciles on l_quantity") {
    val values = graft.operators.HistogramOps.validValues(
      spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet"),
      "l_quantity")
    val approx = graft.operators.PercentileOps
      .approxDeciles(values)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(approx.keySet == (0 to 100 by 10).map(_.toLong).toSet)
    // l_quantity ∈ [1, 50]; approx median must be sane
    assert(approx(0L) == 1.0 && approx(100L) == 50.0)
    assert(approx(50L) >= 20.0 && approx(50L) <= 30.0)
  }

  test("labelNoise golden: mislabeled point flagged suspect, clean clusters agree") {
    // two orthogonal clusters; id 5 sits in cluster B but carries label 0
    val rows = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0),
      (3L, Array(0f, 1f), 1), (4L, Array(0f, 1f), 1),
      (5L, Array(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.SimilarityOps
      .labelNoise(rows, k = 2, probeEvery = 1)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // label 0 probes {0,1,2,5}: m = 2,2,2,0 → mean 6/8, one suspect (id 5)
    assert(out(0) == ((4L, 0.75, 1L)))
    // label 1 probes {3,4}: each has neighbors {the other B point, id 5} →
    // m = 1, 2m == k is NOT a minority → no suspects
    assert(out(1) == ((2L, 0.5, 0L)))
  }

  test("lshTuning: masked-bucket stats equal a direct per-config computation") {
    val dim = 2
    val rows = (0 until 40).map(i =>
      (i.toLong, Array(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.lshTuning(rows, dim, Seq(2, 4)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq(2, 4).foreach { p =>
      val c = SimilarityOps.corpus(rows)
        .select(SimilarityOps.lshBucket(col("emb"), p, dim).as("b"))
        .groupBy("b").count().collect().map(_.getLong(1))
      val avg = BigDecimal(c.map(x => x * x).sum.toDouble / c.sum.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(p) == ((c.length.toLong, c.max, avg)), s"p=$p disagrees with direct run")
    }
    // more planes can only split buckets: occupancy up, candidate lists down
    assert(got(4)._1 >= got(2)._1 && got(4)._3 <= got(2)._3)
  }

  test("labelOutliers golden: planted far point ranks first in its label") {
    val rows = Seq(
      (1L, Array(1.0f, 0f), 0), (2L, Array(1.1f, 0f), 0),
      (3L, Array(0.9f, 0f), 0), (4L, Array(5.0f, 0f), 0), // planted outlier
      (5L, Array(0f, 1.0f), 1), (6L, Array(0f, 1.2f), 1),
      (7L, Array(0f, -3.0f), 1)) // planted outlier
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.KMeansOps.labelOutliers(rows, topK = 1).collect()
    graft.operators.DedupOps.releaseShingleCaches()
    assert(out.map(r => r.getInt(0) -> r.getLong(2)).toMap == Map(0 -> 4L, 1 -> 7L))
    assert(out.forall(_.getInt(1) == 1))
    // distances are exact micro² integers: label-0 centroid x = 2_000_000,
    // the outlier sits 3_000_000 away → dist exactly 9e12
    assert(out.find(_.getInt(0) == 0).get.getLong(3) == 9000000000000L)
  }
}
