package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfOps

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("golden: backward as-of picks the latest right row at or before ts") {
    val left = Seq(
      (1L, 10L, 100L), // before any right row → null
      (2L, 10L, 200L), // == right ts 200 → tie counts
      (3L, 10L, 250L), // between 200 and 300
      (4L, 10L, 350L), // after 300
      (5L, 99L, 500L)) // other key, no right rows
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (10L, 200L, 2.0),
      (10L, 300L, 3.0))
      .toDF("user_id", "ts_us", "v")
    val out = AsOfOps
      .asofJoinBackward(left, right, "user_id", "ts_us", "v")
      .select("event_id", "v")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      1L -> None,
      2L -> Some(2.0),
      3L -> Some(2.0),
      4L -> Some(3.0),
      5L -> None))
  }

  test("ties among right rows resolve to the greatest value deterministically") {
    val left = Seq((1L, 1L, 100L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq((1L, 100L, 5.0), (1L, 100L, 7.0)).toDF("user_id", "ts_us", "v")
    val v = AsOfOps
      .asofJoinBackward(left, right, "user_id", "ts_us", "v")
      .select("v")
      .head()
      .getDouble(0)
    assert(v == 7.0)
  }

  test("graft_cosine is callable from SQL text") {
    SparkEntry.tune(spark)
    val r = spark
      .sql("SELECT graft_cosine(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c")
      .head()
      .getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("GraftExtensions injects into a fresh SparkSessionExtensions") {
    // builder-config path (spark.sql.extensions) needs a brand-new JVM
    // session; here we verify the injection itself executes
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
