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

  test("determinism under repartitioning: position-derived salts never reach results") {
    // monotonically_increasing_id audit (round-11 verdict #6): both use
    // sites derive only the SALT from row position. saltedSum's final
    // combine is position-independent (integral sum, associative +
    // commutative); saltedBroadcastJoin joins against IDENTICAL dim
    // replicas, so which replica a row meets cannot change the output.
    // Pin: different physical layouts -> identical results, row for row.
    val rows = (1 to 3000).map { i =>
      (if (i % 10 == 0) (i % 7).toLong else 0L, i.toLong)
    }
    val df = rows.toDF("key", "v")
    def sums(parts: Int) = SkewOps
      .saltedSum(df.repartition(parts), "key", "v", salt = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(sums(3) == sums(13))

    val fact = (1 to 600).map(i => ((i % 5).toLong, i.toLong)).toDF("key", "v")
    val dim = (0 until 5).map(k => (k.toLong, s"name$k")).toDF("key", "name")
    def joined(parts: Int) = SkewOps
      .saltedBroadcastJoin(fact.repartition(parts), dim, "key", salt = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(joined(2) == joined(11))
    // the joined multiset equals the unsalted join's, not just its aggregate
    val plainRows = fact.join(dim, "key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(joined(2) == plainRows)
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
