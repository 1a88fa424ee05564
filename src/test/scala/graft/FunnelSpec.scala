package graft

import org.apache.spark.sql.functions.col

import graft.operators.FunnelOps

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel golden: ordering, gap cutoff, and dropout") {
    // (user, type, ts): u1 completes A→B→C in order within gaps;
    // u2 does B before A (B must not count; no B after A → drops at stage 2);
    // u3 does A→B but B arrives after the gap; u4 never does A
    val ev = Seq(
      (1L, "A", 100L), (1L, "B", 150L), (1L, "C", 190L),
      (2L, "B", 50L), (2L, "A", 100L), (2L, "C", 120L),
      (3L, "A", 100L), (3L, "B", 300L),
      (4L, "B", 10L), (4L, "C", 20L))
      .toDF("user_id", "event_type", "ts_us")
    val stages = Seq(
      col("event_type") === "A",
      col("event_type") === "B",
      col("event_type") === "C")
    val row = FunnelOps.funnelSummary(ev, "user_id", "ts_us", stages, maxGap = 100L).collect()(0)
    assert(row.getLong(0) == 4L, "total users")
    assert(row.getLong(1) == 3L, "A cohort: u1, u2, u3")
    assert(row.getLong(2) == 1L, "B-after-A within gap: only u1")
    assert(row.getLong(3) == 1L, "C after B: u1")
    assert(row.getDouble(4) == math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(row.getDouble(5) == 1.0)
  }

  test("stage times are the earliest qualifying events") {
    val ev = Seq(
      (1L, "A", 100L), (1L, "A", 50L), (1L, "B", 120L), (1L, "B", 60L))
      .toDF("user_id", "event_type", "ts_us")
    val Seq(s1, s2) = FunnelOps.stageTimes(
      ev,
      "user_id",
      "ts_us",
      Seq(col("event_type") === "A", col("event_type") === "B"),
      maxGap = 1000L)
    assert(s1.collect()(0).getLong(1) == 50L)
    // earliest B strictly after t1=50 is 60 (not 120)
    assert(s2.collect()(0).getLong(1) == 60L)
  }
}
