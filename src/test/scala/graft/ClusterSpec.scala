package graft

import graft.operators.{ClusterOps, DedupOps, TextOps}
import graft.sources.Tables

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connected components golden: chain, triangle, singleton") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    // chain 1-2-3 (diameter 2), triangle 4-5-6, singleton 7
    val edges = Seq((2L, 3L), (1L, 2L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("a_id", "b_id")
    val got = ClusterOps
      .connectedComponents(nodes, edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L))
    DedupOps.releaseShingleCaches()
  }

  test("connected components fails fast when maxIter is too small") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id") // diameter 3
    val e = intercept[IllegalStateException] {
      ClusterOps.connectedComponents(nodes, edges, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    DedupOps.releaseShingleCaches()
  }

  test("nearDupClusters == union-find over the jaccard pairs") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val pairs = DedupOps
      .jaccardPairs(docs, 3, 0.5)
      .select("a_id", "b_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    // reference union-find
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = ids.map(i => i -> find(i)).toMap
    val got = ClusterOps
      .nearDupClusters(docs, 3, 0.5)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == want)
    assert(got.values.toSet.size < ids.length, "fixture should contain non-trivial clusters")
    DedupOps.releaseShingleCaches()
  }

  test("dataset split: deterministic, exhaustive, roughly stratified") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val s1 = TextOps.datasetSplit(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = TextOps.datasetSplit(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2)
    val n = s1.size.toDouble
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train ${frac("train")}")
    assert(frac.keySet == Set("train", "val", "test"))
  }

  test("top terms: ranks 1..k per language, counts non-increasing") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rows = TextOps.topTerms(docs, 5).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).toSeq == (1 to rs.length))
      val counts = rs.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    }
  }
  test("survivors: one winner per cluster, longest copy wins, removals add up") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = graft.operators.ClusterOps
      .nearDupSurvivors(docs, n = 3, minJaccard = 0.5)
      .collect()
    graft.operators.DedupOps.releaseShingleCaches()
    val nDocs = docs.count()
    assert(out.map(_.getLong(1)).sum == nDocs, "every doc in exactly one cluster")
    assert(out.map(_.getLong(4)).sum == nDocs - out.length, "removed = docs - clusters")
    // the survivor must be a member of its own cluster (id >= cluster min label)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(0))
      assert(r.getLong(1) == r.getLong(4) + 1)
    }
  }
  test("triangleCount edge: empty and single-edge graphs are defined") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    val r0 = ClusterOps.triangleCount(empty).collect()(0)
    assert(r0.getAs[Long]("n_nodes") == 0L && r0.getAs[Long]("n_triangles") == 0L)
    DedupOps.releaseShingleCaches()
    val one = Seq((1L, 2L)).toDF("u", "v")
    val r1 = ClusterOps.triangleCount(one).collect()(0)
    assert((r1.getAs[Long]("n_nodes"), r1.getAs[Long]("n_edges"),
      r1.getAs[Long]("n_wedges"), r1.getAs[Long]("n_triangles")) == ((2L, 1L, 0L, 0L)))
    DedupOps.releaseShingleCaches()
  }

  test("triangleCount goldens: K4, path, and K4-plus-pendant") {
    // K4: 4 triangles, wedges = 4·C(3,2) = 12, clustering = 1
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val r1 = ClusterOps.triangleCount(k4).collect()(0)
    assert((r1.getAs[Long]("n_nodes"), r1.getAs[Long]("n_edges"),
      r1.getAs[Long]("n_wedges"), r1.getAs[Long]("n_triangles")) == ((4L, 6L, 12L, 4L)))
    assert(r1.getAs[Double]("clustering") == 1.0)
    DedupOps.releaseShingleCaches()
    // path 1-2-3-4: 0 triangles, 2 wedges
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r2 = ClusterOps.triangleCount(path).collect()(0)
    assert((r2.getAs[Long]("n_wedges"), r2.getAs[Long]("n_triangles")) == ((2L, 0L)))
    DedupOps.releaseShingleCaches()
    // K4 + pendant on node 4: still 4 triangles; wedges 12 + C(4,2)-C(3,2)=+3 +0 → 15
    val k4p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val r3 = ClusterOps.triangleCount(k4p).collect()(0)
    assert((r3.getAs[Long]("n_nodes"), r3.getAs[Long]("n_wedges"),
      r3.getAs[Long]("n_triangles")) == ((5L, 15L, 4L)))
    DedupOps.releaseShingleCaches()
  }

  test("pagerank golden: linked pair holds teleport-steady rank, dangling node decays") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("a_id", "b_id")
    val out = graft.operators.ClusterOps
      .pagerank(nodes, edges, iterations = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    graft.operators.DedupOps.releaseShingleCaches()
    val t = 1000000000L / 3
    // the 1-2 pair exchanges its full rank each round: (15t + 85t) DIV 100 == t
    assert(out(1L) == t && out(2L) == t)
    // the dangling node keeps only the teleport share
    assert(out(3L) == 15L * t / 100)
  }
}
