package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 verdict #2: the full-surface 2× regression gate only covers
  * queries with a row in `bench_baseline.json` — a query added without one
  * silently lands OUTSIDE the gate (the exact blind spot the round-13
  * re-baseline closed, re-openable by any future addition). This is the
  * sibling of PlanSweepSpec's whitelist-rot check: every declared query
  * must have a positive baseline median, and every baseline row must name
  * a still-declared query (rot detection — a renamed/removed query must
  * not leave a stale row that the ratio-of-sums silently joins away).
  */
class BenchBaselineSpec extends AnyFunSuite {

  private lazy val baseline: Map[String, Double] = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("bench_baseline.json"))
    "\"([A-Za-z0-9_]+)\":\\s*(-?[0-9.]+)".r
      .findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
  }

  test("every declared query has a positive bench_baseline.json median") {
    val missing = SparkEntry.queries.keySet.filterNot(q => baseline.get(q).exists(_ > 0))
    assert(
      missing.isEmpty,
      s"queries outside the full-surface 2x gate (append via tools/TimeQueries " +
        s"using the recorded procedure): ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("no stale baseline rows for undeclared queries") {
    val stale = baseline.keySet -- SparkEntry.queries.keySet
    assert(
      stale.isEmpty,
      s"baseline rows with no declared query (remove or rename): " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }
}
