package graft

import graft.operators.TextOps
import graft.sources.Tables

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("stats golden") {
    val df = Seq((1L, "ab cde f")).toDF("doc_id", "text")
    val r = TextOps.stats(df).head()
    assert(r.getInt(1) == 8) // chars
    assert(r.getInt(2) == 3) // tokens
    assert(r.getInt(3) == 3) // distinct
    assert(r.getDouble(4) == 2.0) // (8 - 2) / 3
  }

  test("quality: repeated single token scores low diversity") {
    val df = Seq(
      (1L, Seq.fill(30)("word").mkString(" ")),
      (2L, (1 to 30).map(i => if (i % 5 == 0) "the" else s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out =
      TextOps.quality(df).collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(out(1L) == "low" || out(1L) == "medium") // diversity 1/30 fails
    assert(out(2L) == "high")
  }

  test("langId is total and deterministic over the corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = TextOps.langIdSummary(docs)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0) == docs.count())
    val langs = TextOps.LangMarkers.map(_._1).toSet
    out.collect().foreach(r => assert(langs.contains(r.getString(1))))
  }

  test("token counts: ws vs regex vs bpe-ish on a golden doc") {
    val df = Seq((1L, "abc de12 fghij", "en")).toDF("doc_id", "text", "lang")
    val r = TextOps.tokenCounts(df).head()
    assert(r.getLong(1) == 1) // n_docs
    assert(r.getLong(2) == 3) // ws tokens
    assert(r.getLong(3) == 3) // [a-z]+: abc, de, fghij
    assert(r.getLong(4) == 4) // [a-z]{1,4}: abc, de, fghi, j
  }
}
