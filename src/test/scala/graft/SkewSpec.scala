package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum == plain groupBy sum on a skewed key distribution") {
    // 90% of rows share one key — the hot-key shape salting exists for
    val rows = (1 to 2000).map { i =>
      val key = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (key, i.toLong)
    }
    val df = rows.toDF("key", "v")
    val plain = df
      .groupBy("key")
      .agg(sum("v").as("sum"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val salted = SkewOps
      .saltedSum(df, "key", "v", salt = 16)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(salted == plain)
  }

  test("saltedBroadcastJoin == plain join") {
    val fact = (1 to 500).map(i => (i % 5, i.toLong)).toDF("key", "v")
    val dim = (0 until 5).map(k => (k, s"name$k")).toDF("key", "name")
    val plain = fact
      .join(dim, "key")
      .groupBy("name")
      .agg(sum("v").as("s"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val salted = SkewOps
      .saltedBroadcastJoin(fact, dim, "key", salt = 8)
      .groupBy("name")
      .agg(sum("v").as("s"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(salted == plain)
  }
}
