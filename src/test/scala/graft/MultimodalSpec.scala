package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asMedia: payload bytes are the utf-8 text, mime attached") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val r = MultimodalOps.asMedia(df).head()
    assert(r.getAs[Array[Byte]]("payload").toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(r.getString(2) == "text/plain")
  }

  test("stub decoder: deterministic, correct byte counts, fixed dim") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val feats = MultimodalOps.mediaFeatures(docs, dim = 8)
    val n = docs.count()
    assert(feats.count() == n)
    val row = feats.orderBy("doc_id").head()
    assert(row.getAs[scala.collection.Seq[Float]]("feat").length == 8)
    // n_bytes matches the engine-side octet_length of the same payload
    val mismatch = MultimodalOps
      .asMedia(docs)
      .select(col("doc_id"), octet_length(col("payload")).as("ob"))
      .join(feats.select(col("doc_id"), col("n_bytes")), "doc_id")
      .filter(col("ob") =!= col("n_bytes"))
      .count()
    assert(mismatch == 0)
    // determinism: run twice, identical checksums
    val a = feats.select("doc_id", "checksum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = MultimodalOps
      .mediaFeatures(docs, dim = 8)
      .select("doc_id", "checksum")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(a == b)
  }
}
