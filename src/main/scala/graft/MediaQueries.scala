package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps
import graft.sources.Tables

/** Multimodal-column queries (SURVEY §7.6). `media_features` checks the
  * oracle-expressible half (binary payload schema, byte length, content
  * digest); `media_decode` exercises the full partition-batched stub
  * decoder (FNV checksum + fake embedding — xxhash-free but not
  * SQL-expressible, so rows-only).
  */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> ((s, dir) =>
      MultimodalOps
        .asMedia(Tables.documents(s, dir))
        .select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("mime"))
        .orderBy(col("doc_id"))),
    "media_decode" -> ((s, dir) =>
      MultimodalOps
        .mediaFeatures(Tables.documents(s, dir), dim = 8)
        .select(
          col("doc_id"),
          col("n_bytes"),
          col("checksum"),
          round(element_at(col("feat"), 1), 6).as("feat0"))
        .orderBy(col("doc_id"))))

  val oracle: Map[String, String] = Map(
    "media_features" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       md5(text) AS payload_md5,
        |       'text/plain' AS mime
        |FROM documents ORDER BY doc_id""".stripMargin)
}
