package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainsetOps

/** kfoldAudit / sampleLadder: partition laws (folds cover, shares sum
  * to 1) and the ladder's nesting guarantee.
  */
class TrainsetLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1L to n.toLong)
      .map(i => (i, s"w${i % 7} w${i % 3} w${i % 5}", s"lang${i % 3}"))
      .toDF("doc_id", "text", "lang")

  test("kfoldAudit: cells partition the corpus; per-fold shares sum to 1") {
    val out = TrainsetOps.kfoldAudit(docs(500), "lang", k = 5).collect()
    assert(out.map(_.getLong(2)).sum == 500)
    val folds = out.map(_.getLong(0)).distinct
    assert(folds.length == 5)
    out.groupBy(_.getLong(0)).foreach { case (f, rows) =>
      val shareSum = rows.map(_.getDouble(4)).sum
      assert(math.abs(shareSum - 1.0) < 1e-5, s"fold $f shares $shareSum")
      assert(rows.map(_.getLong(2)).sum == rows.head.getLong(3))
    }
    // deviations are centered: overall shares reappear in every fold row
    assert(out.forall(r => math.abs(r.getDouble(6) - (r.getDouble(4) - r.getDouble(5))) < 2e-6))
  }

  test("sampleLadder: levels are nested and the top level is the corpus") {
    val d = docs(400)
    val out = TrainsetOps.sampleLadder(d).collect().sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L, 16L))
    val nd = out.map(_.getLong(1))
    assert(nd.sliding(2).forall(p => p(0) <= p(1)), nd.toSeq.toString)
    assert(nd.last == 400 && out.last.getDouble(3) == 1.0)
    // nesting at the doc level, not just counts: recompute membership
    val u = graft.functions.PortableHash.hash60(
      concat(lit("ladder:"), col("doc_id").cast("string")))
    val small = d.filter(pmod(u, lit(16L)) < 2L).select("doc_id").collect().map(_.getLong(0)).toSet
    val mid = d.filter(pmod(u, lit(16L)) < 4L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(mid))
    assert(small.size == nd(0) && mid.size == nd(1))
  }
}
