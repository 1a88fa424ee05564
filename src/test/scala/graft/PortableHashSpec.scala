package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, PortableHash}

class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("hash60: native kernel == declarative conv chain == MessageDigest twin") {
    val inputs =
      Seq("", "hello", "0:the quick fox", "a b c", "42", "p,63", "héllo 日本語")
    val decl = inputs
      .toDF("s")
      .select(
        col("s"),
        PortableHash.digest60(md5(col("s"))),
        PortableHash.digest60b(md5(col("s"))))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val got = inputs
      .toDF("s")
      .select(col("s"), PortableHash.hash60(col("s")), PortableHash.hash60b(col("s")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    inputs.foreach { s =>
      assert(got(s) == decl(s), s"native vs declarative($s)")
      assert(got(s)._1 == PortableHash.hash60Local(s), s"hash60($s)")
      val d = java.security.MessageDigest
        .getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x")
        .mkString
      assert(got(s)._2 == java.lang.Long.parseLong(d.substring(16, 31), 16), s"hash60b($s)")
    }
  }

  test("hash60 values are non-negative 60-bit longs") {
    val vs = Seq.tabulate(100)(i => s"k$i")
      .toDF("s")
      .select(PortableHash.hash60(col("s")))
      .collect()
      .map(_.getLong(0))
    assert(vs.forall(v => v >= 0 && v < (1L << 60)))
    assert(vs.distinct.length == vs.length) // no collisions on trivial input
  }

  test("graft_dot: codegen'd dot product == HOF reference and left-to-right order") {
    SparkEntry.tune(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(-0.3, 0.7))).toDF("a", "b")
    val rows = df
      .select(
        GraftFunctions.dot(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
          .as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
