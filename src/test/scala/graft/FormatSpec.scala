package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Source/sink format breadth: JSON-lines and CSV roundtrips with
  * explicit schemas (schema-on-read, no inference job), equal to the
  * parquet truth.
  */
class FormatSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
      .collect()
      .map(_.toSeq)
      .toSeq

  test("json-lines roundtrip: explicit schema, no inference, lossless") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val path = "target/format_spec/docs_jsonl"
    docs.write.mode("overwrite").json(path)
    // schema passed explicitly: at 100 TB an inference pass is a full
    // extra read of the corpus
    val back = spark.read.schema(schema).json(path)
    assert(canon(back) == canon(docs))
  }

  test("csv roundtrip: quoted text survives, explicit schema") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val path = "target/format_spec/docs_csv"
    docs.write.mode("overwrite").option("header", "true").csv(path)
    val back = spark.read.schema(schema).option("header", "true").csv(path)
    assert(canon(back) == canon(docs))
  }

  test("orc roundtrip: columnar alternative, schema preserved, lossless") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val path = "target/format_spec/docs_orc"
    docs.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    // ORC carries its own schema — no explicit StructType needed, and
    // predicate pushdown works like parquet's
    assert(back.schema.fieldNames.toSeq == docs.schema.fieldNames.toSeq)
    assert(canon(back) == canon(docs))
    val pruned = back.select("doc_id").filter(col("doc_id") > 400)
    assert(pruned.count() == docs.filter(col("doc_id") > 400).count())
  }

  test("format-agnostic queries: the oracle query tree runs unchanged on a json copy") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val path = "target/format_spec/docs_for_query"
    docs.write.mode("overwrite").json(path)
    val jsonDocs = spark.read.schema(schema).json(path)
    val a = graft.operators.TextOps.stats(docs).orderBy("doc_id").collect().toSeq
    val b = graft.operators.TextOps.stats(jsonDocs).orderBy("doc_id").collect().toSeq
    assert(a == b, "operators are source-format agnostic")
  }

  test("events ts normalization: both shipped generations accepted, anything else throws") {
    import spark.implicits._
    // nanos-as-long generation
    val nanos = Seq((1L, 1704067200123456789L)).toDF("event_id", "ts")
    val n = Tables.normalizeEventsTs(nanos).select("ts_ns", "ts_us").head()
    assert(n.getLong(0) == 1704067200123456789L && n.getLong(1) == 1704067200123456L)
    // micros-timestamp generation
    val micros = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.123456")))
      .toDF("event_id", "ts")
    val m = Tables.normalizeEventsTs(micros).select("ts_us", "ts_ns").head()
    assert(m.getLong(0) == 1704067200123456L && m.getLong(1) == 1704067200123456000L)
    // an unexpected type must fail loudly at load, not yield null
    // timestamps downstream (the silent-cast trap ADVICE r6 flagged)
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    intercept[IllegalArgumentException](Tables.normalizeEventsTs(bad))
  }
}
