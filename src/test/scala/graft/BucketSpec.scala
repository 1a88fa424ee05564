package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketing = the persistent co-partitioning story for 100 TB fact-fact
  * joins: both tables hash-bucketed on the join key at write time join
  * WITHOUT an exchange (each task zips matching buckets). This spec
  * demonstrates and guards that plan shape using a session-catalog
  * warehouse under target/.
  */
class BucketSpec extends SparkSpec {

  test("bucketed lineitem ⋈ orders: sort-merge join with no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog forgets tables between JVMs but their files
    // survive — clear the warehouse so saveAsTable can recreate them
    import scala.reflect.io.Directory
    new Directory(new java.io.File("target/spark-warehouse")).deleteRecursively()
    spark.read
      .parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
      .write
      .bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .mode("overwrite")
      .saveAsTable("li_bucketed")
    spark.read
      .parquet(s"${TestSpark.sf0001}/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write
      .bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey")
      .mode("overwrite")
      .saveAsTable("ord_bucketed")

    // force the fact-fact join shape (at real scale neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark
        .table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it actually runs
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
