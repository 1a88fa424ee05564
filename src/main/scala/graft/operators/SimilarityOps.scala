package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (SURVEY §7.6).
  *
  * Two paths:
  *  - [[knnBruteForce]]: exact top-k by cosine — broadcast the (small) query
  *    set against the corpus; the cosine kernel is the codegen'd native
  *    expression [[graft.functions.CosineSimilarity]]. O(|Q|·N) but
  *    embarrassingly parallel and shuffle-free until the per-query top-k
  *    window (keyed by query id — bounded state).
  *  - [[knnLsh]]: random-hyperplane LSH — sign-bit bucket join, then exact
  *    cosine only within buckets. The scale path: candidate generation is an
  *    equi-join on bucket id, sub-quadratic for large corpora.
  *
  * Requires GraftFunctions.register on the session (SparkEntry.tune).
  */
object SimilarityOps {

  /** Normalize the corpus: `(vec_id, emb: array<double>)`. */
  def corpus(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))

  /** Exact top-k cosine neighbors for each query vector. Cosines are
    * rounded to 6 decimals *before* ranking so the ordering is reproducible
    * across engines; ties break on candidate id.
    * Output: `(q_id, c_id, rank, cos)`.
    */
  def knnBruteForce(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.toDF("q_id", "q_emb")
    val c = candidates.toDF("c_id", "c_emb")
    val pairs = broadcast(q)
      .crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .select(
        col("q_id"),
        col("c_id"),
        round(GraftFunctions.cosine(col("q_emb"), col("c_emb")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component `r[p][i]`: a uniform
    * double in [-0.5, 0.5) derived from xxhash64 of (p, i) — no RNG state,
    * identical on every executor.
    */
  private def planeComponent(p: Column, i: Column) =
    (pmod(xxhash64(p, i), lit(1000000L)).cast("double") / lit(1000000.0)) - lit(0.5)

  /** Sign-bit LSH bucket id from `numPlanes` hyperplanes. */
  def lshBucket(emb: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(
          emb,
          transform(sequence(lit(0), size(emb) - 1), i => planeComponent(lit(p), i)),
          (x, r) => x * r),
        lit(0.0),
        (acc, v) => acc + v)
      when(dot > 0, lit(1L) * lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: exact cosine within same-bucket candidates only.
    * Same output shape as [[knnBruteForce]]; recall < 1 by construction
    * (tested against the brute-force oracle in SimilaritySpec).
    */
  def knnLsh(queries: DataFrame, candidates: DataFrame, k: Int, numPlanes: Int): DataFrame = {
    val q = queries
      .toDF("q_id", "q_emb")
      .withColumn("bucket", lshBucket(col("q_emb"), numPlanes))
    val c = candidates
      .toDF("c_id", "c_emb")
      .withColumn("bucket", lshBucket(col("c_emb"), numPlanes))
    val pairs = q
      .join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(
        col("q_id"),
        col("c_id"),
        round(GraftFunctions.cosine(col("q_emb"), col("c_emb")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF-style ANN (the other scale path besides LSH): a coarse quantizer
    * of `nlist` centroids (deterministically sampled from the corpus —
    * a production system would k-means them; assignment and search are
    * identical), vectors assigned to their nearest centroid's inverted
    * list, queries probing the `nprobe` nearest lists only.
    *
    * Search cost drops from O(N) to O(N · nprobe / nlist) per query; the
    * probe join is an equi-join on centroid id. Recall is tested against
    * brute force in SimilaritySpec.
    */
  def knnIvf(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      nlist: Int,
      nprobe: Int): DataFrame = {
    val c = candidates.toDF("c_id", "c_emb")
    // deterministic coarse centroids: first nlist vectors by xxhash64 order
    val cents = broadcast(
      c.withColumn("h", xxhash64(col("c_id")))
        .orderBy(col("h"))
        .limit(nlist)
        .select(col("c_id").as("cent_id"), col("c_emb").as("cent_emb")))
    def assign(df: DataFrame, idCol: String, embCol: String, keep: Int) = {
      val w = Window
        .partitionBy(col(idCol))
        .orderBy(
          GraftFunctions.cosine(col(embCol), col("cent_emb")).desc,
          col("cent_id"))
      df.crossJoin(cents)
        .withColumn("cent_rank", row_number().over(w))
        .filter(col("cent_rank") <= keep)
        .drop("cent_emb", "cent_rank")
    }
    val bucketed = assign(c, "c_id", "c_emb", keep = 1)
    val probes = assign(queries.toDF("q_id", "q_emb"), "q_id", "q_emb", keep = nprobe)
    val pairs = probes
      .join(bucketed, Seq("cent_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(
        col("q_id"),
        col("c_id"),
        round(GraftFunctions.cosine(col("q_emb"), col("c_emb")), 6).as("cos"))
      .distinct() // a candidate can appear via several probed lists
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Embedding near-dup pairs: all pairs with cosine ≥ `minCos`.
    * Self-join pruned to a_id < b_id; the cosine kernel is codegen'd.
    * For corpora where O(n²) is prohibitive, [[knnLsh]]'s bucket join is
    * the template. Output `(a_id, b_id, cos)`.
    */
  def nearDupPairs(embeddings: DataFrame, minCos: Double): DataFrame = {
    val e = corpus(embeddings)
    val a = e.toDF("a_id", "a_emb")
    val b = e.toDF("b_id", "b_emb")
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        round(GraftFunctions.cosine(col("a_emb"), col("b_emb")), 6).as("cos"))
      .filter(col("cos") >= lit(minCos))
      .orderBy(col("a_id"), col("b_id"))
  }
}
