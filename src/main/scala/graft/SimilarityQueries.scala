package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.sources.Tables

/** Similarity-search queries over `embeddings` (SURVEY §7.6).
  *
  * `knn_cosine` is the exact brute-force baseline (oracle-checked against
  * DuckDB's list_dot_product — both sides compute sequential double sums, so
  * they agree to well past the 6 rounded decimals). `knn_lsh` is the
  * sub-quadratic scale path (no oracle — recall is property-tested against
  * brute force in SimilaritySpec).
  */
object SimilarityQueries {

  private def queriesAndCorpus(s: SparkSession, dir: String) = {
    val e = SimilarityOps.corpus(Tables.embeddings(s, dir))
    (e.filter(col("vec_id") % 50 === 0), e)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_cosine" -> ((s, dir) => {
      val (q, c) = queriesAndCorpus(s, dir)
      SimilarityOps.knnBruteForce(q, c, k = 10)
    }),
    // 4 planes = 16 buckets: dense enough for real candidate lists at the
    // test corpus sizes; at cluster scale you'd raise planes with corpus
    // size (buckets ~ n / desired-candidates).
    "knn_lsh" -> ((s, dir) => {
      val (q, c) = queriesAndCorpus(s, dir)
      SimilarityOps.knnLsh(q, c, k = 10, numPlanes = 4)
    }),
    // IVF scale path: 16 inverted lists, probe the 4 nearest. Rows-only
    // (recall vs brute force asserted in SimilaritySpec).
    "knn_ivf" -> ((s, dir) => {
      val (q, c) = queriesAndCorpus(s, dir)
      SimilarityOps.knnIvf(q, c, k = 10, nlist = 16, nprobe = 4)
    }))

  val oracle: Map[String, String] = Map(
    "knn_cosine" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        |), q AS (
        |  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 50 = 0
        |), p AS (
        |  SELECT q_id, e.vec_id AS c_id,
        |         round(list_dot_product(q_emb, e.emb)
        |               / (sqrt(list_dot_product(q_emb, q_emb))
        |                  * sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
        |  FROM q, e WHERE e.vec_id <> q.q_id
        |), r AS (
        |  SELECT q_id, c_id, cos,
        |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS INT) AS rank
        |  FROM p
        |)
        |SELECT q_id, c_id, rank, cos FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)
}
