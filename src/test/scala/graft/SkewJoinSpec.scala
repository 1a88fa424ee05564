package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the built-in complement to SkewOps' manual
  * salting: a runtime-detected oversized shuffle partition is split into
  * sub-partitions and the matching build side replicated, so one hot key
  * can't serialize a 1000-executor join behind a single straggler task.
  * Pinned here with test-scale thresholds; at 100 TB the defaults
  * (256 MB partitions) trigger on their own.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed shuffle-join partition (skew=true in the final plan)") {
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // a broadcast join can't skew — force the 100 TB fact⋈fact shape
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 200k rows on ONE key vs a uniform right side: the hot partition is
      // ~100× the advisory size
      val fact = spark.range(200000)
        .select(lit(7L).as("key"), col("id").as("payload"))
        .union(spark.range(2000).select((col("id") % 64).as("key"), col("id")))
      val dim = spark.range(64).select(col("id").as("key"), (col("id") * 10).as("w"))
      val joined = fact.join(dim, Seq("key")).agg(sum(col("payload") + col("w")).as("s"))
      val expected = joined.collect().head.getLong(0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected a skew-split join in:\n$plan")
      // answer unchanged by the split (sanity vs a broadcast-join recompute)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      val again = fact.join(broadcast(dim), Seq("key"))
        .agg(sum(col("payload") + col("w"))).collect().head.getLong(0)
      assert(again == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
