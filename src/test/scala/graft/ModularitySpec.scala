package graft

import graft.operators.ClusterOps

/** ClusterOps.modularity: textbook goldens — clean communities score
  * high, the trivial one-cluster partition scores 0, random-cut
  * partitions score ~0.
  */
class ModularitySpec extends SparkSpec {
  import spark.implicits._

  private def q(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)]): Double = {
    val r = ClusterOps
      .modularity(edges.toDF("a_id", "b_id"), labels.toDF("node", "cid"))
      .collect()(0)
    r.getDouble(3)
  }

  // two disjoint triangles
  private val twoTriangles =
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))

  test("perfectly separated communities: Q = 1/2 for two equal cliques") {
    // all 6 edges within; each community holds half the degree mass:
    // Q = 1 − 2·(1/2)² = 0.5
    val labels = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 1L)
    assert(math.abs(q(twoTriangles, labels) - 0.5) < 1e-6)
  }

  test("one-cluster partition always scores exactly 0") {
    val labels = (1L to 6L).map(_ -> 0L)
    assert(q(twoTriangles, labels) == 0.0)
  }

  test("a partition that cuts both communities scores below the clean one") {
    val bad = Seq(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 0L, 6L -> 1L)
    assert(q(twoTriangles, bad) < 0.1)
  }

  test("hand-computed mixed graph") {
    // edges: within A {1-2}, within B {3-4}, across {2-3}: m=3
    // within=2; degrees: A nodes 1+2=3, B nodes 2+1=3 → Σdeg²=9+9=18
    // Q = 2/3 − 18/36 = 1/6
    val edges = Seq((1L, 2L), (3L, 4L), (2L, 3L))
    val labels = Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L)
    assert(math.abs(q(edges, labels) - 1.0 / 6.0) < 1e-6)
  }
}
