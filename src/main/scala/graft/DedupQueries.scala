package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.Tables

/** Deduplication queries over `documents` / `embeddings` (SURVEY §7.6).
  *
  * `dedup_minhash` and `dedup_simhash` use Spark's xxhash64 (no DuckDB
  * equivalent) → no oracle entries; their correctness is property-tested in
  * DedupSpec (MinHash estimates vs exact Jaccard, SimHash Hamming vs
  * near-dup pairs).
  */
object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) => DedupOps.exact(Tables.documents(s, dir))),
    "dedup_fingerprint" -> ((s, dir) => DedupOps.fingerprintDedup(Tables.documents(s, dir))),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      DedupOps.jaccardPairs(Tables.documents(s, dir), n = 3, minJaccard = 0.5)),
    "dedup_minhash" -> ((s, dir) =>
      DedupOps.minhashLsh(
        Tables.documents(s, dir),
        n = 3,
        numPerm = 16,
        rowsPerBand = 4,
        minEst = 0.5)),
    // maxHamming = 5: measured on sf0.01, true near-dups (3-gram jaccard
    // ≥ 0.5) land at hamming 0-5 while the shared-vocabulary background
    // explodes from 6 up.
    "dedup_simhash" -> ((s, dir) =>
      DedupOps.simhashPairs(Tables.documents(s, dir), maxHamming = 5)),
    "dedup_embedding" -> ((s, dir) =>
      SimilarityOps.nearDupPairs(Tables.embeddings(s, dir), minCos = 0.4)))

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id,
        |       CAST(count(*) AS BIGINT) AS n_dups,
        |       md5(text) AS text_md5
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "dedup_fingerprint" ->
      """SELECT min(doc_id) AS keep_id,
        |       CAST(count(*) AS BIGINT) AS n_dups,
        |       fp
        |FROM (SELECT doc_id, md5(lower(regexp_replace(text, '\s+', '', 'g'))) AS fp
        |      FROM documents)
        |GROUP BY fp ORDER BY keep_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(tk) >= 3
        |              THEN list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
        |              ELSE CAST([] AS VARCHAR[]) END AS sh
        |  FROM t
        |), u AS (
        |  SELECT doc_id, CAST(len(sh) AS INT) AS nsh, unnest(sh) AS s FROM sh
        |), p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |         CAST(count(*) AS BIGINT) AS inter,
        |         min(a.nsh) AS na, min(b.nsh) AS nb
        |  FROM u a JOIN u b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id, inter, na, nb,
        |       round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
        |FROM p
        |WHERE round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        |), p AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         round(list_dot_product(a.emb, b.emb)
        |               / (sqrt(list_dot_product(a.emb, a.emb))
        |                  * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos
        |  FROM e a, e b WHERE a.vec_id < b.vec_id
        |)
        |SELECT a_id, b_id, cos FROM p WHERE cos >= 0.4 ORDER BY a_id, b_id""".stripMargin)
}
