package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Runtime-filter behavior at the physical-plan level: dynamic partition
  * pruning against a hive-partitioned fact table, and bloom-filter
  * runtime filters on a selective fact⋈fact join. Both are the
  * scan-reduction mechanisms a 100 TB deployment lives on — pinned here
  * so layout/conf changes can't silently lose them.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition pruning: dim filter reaches the fact scan's partition filters") {
    val path = "target/rtf/events_by_type"
    graft.sources.Tables
      .events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("value"), col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    val fact = spark.read.parquet(path)
    // selective dim: only one partition survives the join. The dim must be
    // file-backed with a REAL filter node — a filtered LocalRelation
    // constant-folds and DPP's selective-predicate detection never sees it
    val dimPath = "target/rtf/type_dim"
    Seq(("purchase", 1), ("view", 0), ("click", 0), ("signup", 0), ("error", 0))
      .toDF("event_type", "w")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("w") === 1)
    val q = fact
      .join(dim, Seq("event_type"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic pruning expression in the fact scan:\n$plan")
    assert(q.collect().head.getLong(0) > 0)
  }

  test("bloom-filter runtime filter: selective dim join injects might_contain on the fact scan") {
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.get(k))
    try {
      // test-scale thresholds: the mechanism, not the size heuristic, is
      // what this spec pins (at 100 TB the defaults pass on their own).
      // Bloom injection only targets shuffle joins — at test scale the
      // filtered orders side would auto-broadcast, so force the shuffle
      // shape a 100 TB fact⋈fact join would actually have.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val li = graft.sources.Tables.lineitem(spark, TestSpark.sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = graft.sources.Tables.orders(spark, TestSpark.sf0001)
        .filter(col("o_totalprice") > 500000.0) // selective creation side
        .select(col("o_orderkey"))
      val q = li
        .join(ord.hint("shuffle_merge"), col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("s"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter runtime filter in the optimized plan:\n$plan")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
