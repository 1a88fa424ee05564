package graft

import org.apache.spark.sql.functions._

import graft.operators.RankOps

/** RankOps.rrfFuse: contribution quantization, multi-list dominance, and
  * deterministic tie-breaks.
  */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(pairs: (Long, Int)*) = pairs.toSeq.toDF("doc_id", "rank")

  test("single list: fused order preserves the input order with exact contributions") {
    val out = RankOps
      .rrfFuse(Seq(ranked(7L -> 1, 3L -> 2, 9L -> 3)), k0 = 60, topK = 10)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L, 3L, 9L))
    // round(1e9/61), round(1e9/62), round(1e9/63)
    assert(out.map(_.getLong(2)).toSeq == Seq(16393443L, 16129032L, 15873016L))
    assert(out.forall(_.getLong(1) == 1L)) // n_lists
  }

  test("a doc on both lists outranks a doc with one better single-list rank") {
    // doc 1: rank 3 on both lists → 2·round(1e9/63) = 31746032
    // doc 2: rank 1 on list A only → round(1e9/61) = 16393443
    val a = ranked(1L -> 3, 2L -> 1)
    val b = ranked(1L -> 3, 5L -> 1)
    val out = RankOps.rrfFuse(Seq(a, b)).collect()
    assert(out.head.getLong(0) == 1L)
    assert(out.head.getLong(1) == 2L)
    assert(out.head.getLong(2) == 2L * 15873016L)
  }

  test("equal fused scores tie-break on doc_id ascending") {
    val a = ranked(10L -> 1, 20L -> 2)
    val b = ranked(20L -> 1, 10L -> 2)
    val out = RankOps.rrfFuse(Seq(a, b)).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 20L))
    assert(out(0).getLong(2) == out(1).getLong(2))
  }

  test("topK truncates the fused ladder") {
    val lists = Seq(ranked((1L to 30L).map(i => i -> i.toInt): _*))
    assert(RankOps.rrfFuse(lists, topK = 5).count() == 5)
  }
}
