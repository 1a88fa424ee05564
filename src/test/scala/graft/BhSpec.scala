package graft

import graft.operators.EvalOps

/** EvalOps.bhReject: textbook BH goldens, the step-up property (an
  * individually-failing p is still rejected when a later rank passes),
  * and the no-rejection family.
  */
class BhSpec extends SparkSpec {
  import spark.implicits._

  private def run(ps: Seq[(String, Long)], aNum: Long = 1L, aDen: Long = 10L) =
    EvalOps.bhReject(ps.toDF("grp", "p_nano"), aNum, aDen).collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap

  test("textbook golden: rejects exactly the BH prefix") {
    // m=5, alpha=0.1: thresholds i*0.02 = .02 .04 .06 .08 .10
    // p = .010 .030 .045 .200 .900 → i=1 pass, i=2 fail (.03>.04? no —
    // .03 ≤ .04 pass), i=3: .045 ≤ .06 pass, i=4: .2 > .08, i=5: .9 > .1
    // → max passing i = 3 → reject first three.
    val ps = Seq(
      ("a", 10000000L), ("b", 30000000L), ("c", 45000000L),
      ("d", 200000000L), ("e", 900000000L))
    val got = run(ps)
    assert(got == Map("a" -> true, "b" -> true, "c" -> true, "d" -> false, "e" -> false))
  }

  test("step-up: a rank failing its own line is rescued by a later passer") {
    // m=4, alpha=0.2: lines .05 .10 .15 .20
    // p = .060 .070 .140 .190: i=1 fails (.06>.05) but i=4 passes
    // (.19 ≤ .20) → ALL four rejected (max_i = 4).
    val ps = Seq(
      ("a", 60000000L), ("b", 70000000L), ("c", 140000000L), ("d", 190000000L))
    val got = run(ps, aNum = 1L, aDen = 5L)
    assert(got.values.forall(identity), got.toString)
  }

  test("nothing passes: empty rejection set, ranks still dense") {
    val ps = Seq(("a", 500000000L), ("b", 700000000L), ("c", 999000000L))
    val out = EvalOps.bhReject(ps.toDF("grp", "p_nano")).collect()
    assert(out.forall(!_.getBoolean(4)))
    assert(out.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("boundary equality rejects (<= not <), exact integers") {
    // m=2, alpha=1/2: line for i=1 is exactly 0.25 → p=0.25 must reject
    val ps = Seq(("edge", 250000000L), ("big", 990000000L))
    val got = run(ps, aNum = 1L, aDen = 2L)
    assert(got("edge"))
  }
}
