package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** SketchOps.heavyHittersSampled: pass-2 counts are exact, the candidate
  * filter is deterministic, and abundant bigrams always survive the
  * sample at test scales.
  */
class HeavyHitterSpec extends SparkSpec {
  import spark.implicits._

  test("verified counts equal the exact bigram counts; ranks ordered") {
    // 40 docs of "alpha beta gamma alpha beta": per doc bigrams
    // "alpha beta"×2, "beta gamma"×1, "gamma alpha"×1 → 80/40/40 overall.
    val docs = (1L to 40L).map(i => (i, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val out = SketchOps
      .heavyHittersSampled(docs, sampleDen = 2L, candMin = 1L, threshold = 40L)
      .collect()
    val counts = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(counts == Map("alpha beta" -> 80L, "beta gamma" -> 40L, "gamma alpha" -> 40L))
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    assert(out.head.getString(0) == "alpha beta")
  }

  test("below-threshold bigrams are dropped even when sampled") {
    val docs = ((1L to 50L).map(i => (i, "x y")) ++ Seq((99L, "p q"))).toDF("doc_id", "text")
    val out = SketchOps
      .heavyHittersSampled(docs, sampleDen = 1L, candMin = 1L, threshold = 10L)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("x y"))
    assert(out.head.getLong(1) == 50L) // sampleDen=1: sample IS the corpus
  }

  test("single-token and empty docs produce no bigrams and no failures") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b a b a b a b a b")).toDF("doc_id", "text")
    val out = SketchOps
      .heavyHittersSampled(docs, sampleDen = 1L, candMin = 1L, threshold = 4L)
      .collect()
    // "a b" ×5, "b a" ×4 in doc 3 only
    assert(out.map(r => r.getString(0) -> r.getLong(2)).toMap == Map("a b" -> 5L, "b a" -> 4L))
  }

  test("deterministic: two runs return identical rows") {
    val docs = (1L to 30L)
      .map(i => (i, s"w${i % 3} w${i % 5} w${i % 3} w${i % 7}"))
      .toDF("doc_id", "text")
    val a = SketchOps.heavyHittersSampled(docs, 4L, 1L, 5L).collect().toSeq
    val b = SketchOps.heavyHittersSampled(docs, 4L, 1L, 5L).collect().toSeq
    assert(a == b)
  }
}
