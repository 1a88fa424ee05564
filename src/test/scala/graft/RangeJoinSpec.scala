package graft

import org.apache.spark.sql.functions._

import graft.operators.{RangeJoinOps, SessionOps}
import graft.sources.Tables

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("golden: points match containing intervals, inclusive bounds") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 25L), (5L, -3L))
      .toDF("pid", "pt")
    val intervals = Seq((100L, 0L, 10L), (200L, 10L, 20L), (300L, -5L, -1L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoinOps
      .joinPointsToIntervals(points, intervals, "pt", "lo", "hi", bucketWidth = 7)
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L), (5L, 300L)))
  }

  test("bucketed range join == naive inequality join on real session intervals") {
    val events = Tables.events(spark, TestSpark.sf0001)
    val sessions = SessionOps
      .sessionsBatch(events, 1800000000L)
      .select(col("user_id").as("s_user"), col("start_us"), col("end_us"))
    val points = events.select(col("event_id"), col("ts_us"))
    val bucketed = RangeJoinOps
      .joinPointsToIntervals(points, sessions, "ts_us", "start_us", "end_us",
        bucketWidth = 3600L * 1000000L)
      .select("event_id", "s_user", "start_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val naive = points
      .join(sessions, col("ts_us") >= col("start_us") && col("ts_us") <= col("end_us"))
      .select("event_id", "s_user", "start_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }
}
