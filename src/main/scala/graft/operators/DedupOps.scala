package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline surface
  * (SURVEY §7.6): exact, content-fingerprint, n-gram Jaccard, MinHash+LSH
  * banding, and SimHash.
  *
  * Scale design: exact/fingerprint dedup are single hash-shuffles on a
  * digest (never on the full text at the exchange — the digest is computed
  * map-side). Pairwise similarity never materializes the O(n²) cross join:
  * candidates come from an equi-join on shared shingles (or LSH band
  * buckets), which Spark executes as a shuffled hash join keyed by
  * shingle/bucket.
  */
object DedupOps {

  /** Exact dedup groups: one row per distinct text, keeping the smallest
    * doc_id as the canonical survivor (standard keep-first policy).
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"), md5(col("text")).as("text_md5"))
      .orderBy(col("keep_id"))

  /** Survivor view: drop all but the canonical copy of each exact group.
    * Equivalent to `row_number() over (partition by text order by doc_id)=1`.
    */
  def exactSurvivors(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Content fingerprint: md5 of the whitespace-normalized, lowercased
    * text — catches dups that differ only in spacing/case. The digest is
    * computed map-side so the dedup shuffle moves 16-byte keys, not
    * documents.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", "")))

  def fingerprintDedup(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"), col("fp"))
      .orderBy(col("keep_id"))

  /** Distinct word n-gram shingles of a token array (standard shingling for
    * near-dup detection). Docs shorter than n shingle to empty.
    */
  def shingles(tokens: Column, n: Int): Column =
    when(
      size(tokens) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(tokens) - lit(n - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** `(doc_id, nsh, shingle)` exploded long form — the join key relation
    * for candidate generation.
    *
    * Persisted: the downstream self-join would otherwise evaluate the
    * interpreted higher-order shingle expression 2-3× per row per side
    * (Catalyst inlines the projection into the explode's pushed-down
    * `size(..) > 0` filter). Spark's CacheManager keys on the logical plan,
    * so repeated calls share one entry; size is O(corpus tokens).
    */
  private def shingleRows(docs: DataFrame, n: Int): DataFrame = {
    // Tokenize behind its own cache barrier: otherwise Catalyst inlines
    // `split(text)` into the shingle lambda and the text is re-tokenized
    // once per shingle position (~90× blow-up).
    val tokenized = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tokenized
      .select(col("doc_id"), shingles(col("tk"), n).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Pairwise n-gram Jaccard similarity ≥ `minJaccard`, candidates blocked
    * by shared shingles (docs sharing zero shingles are never paired, so no
    * O(n²) blow-up; the intersection count falls out of the same join).
    *
    * Output: `(a_id, b_id, inter, na, nb, jaccard)`, a_id < b_id.
    */
  def jaccardPairs(docs: DataFrame, n: Int, minJaccard: Double): DataFrame = {
    val sh = shingleRows(docs, n)
    val a = sh.toDF("a_id", "na", "s")
    val b = sh.toDF("b_id", "nb", "s")
    a.join(b, Seq("s"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"), min(col("na")).as("na"), min(col("nb")).as("nb"))
      .withColumn(
        "jaccard",
        round(
          col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double"),
          6))
      .filter(col("jaccard") >= lit(minJaccard))
      .select(col("a_id"), col("b_id"), col("inter"), col("na"), col("nb"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash signatures: `numPerm` permutations simulated with seeded
    * xxhash64 (`h_j(s) = xxhash64(j || s)`), min per (doc, seed).
    * Long form `(doc_id, seed, mh)`.
    */
  def minhash(docs: DataFrame, n: Int, numPerm: Int): DataFrame =
    shingleRows(docs, n)
      .select(
        col("doc_id"),
        explode(sequence(lit(0), lit(numPerm - 1))).as("seed"),
        col("s"))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(xxhash64(col("seed"), col("s"))).as("mh"))

  /** MinHash + LSH banding near-dup candidates: seeds are grouped into
    * `numPerm / rowsPerBand` bands; docs colliding on any full band become
    * candidates; the estimated Jaccard is the fraction of matching minhash
    * components. Output `(a_id, b_id, est_jaccard)` with est ≥ `minEst`.
    *
    * At scale this is the standard sub-quadratic path: the only join is an
    * equi-join on (band, band_key) buckets.
    */
  def minhashLsh(
      docs: DataFrame,
      n: Int,
      numPerm: Int,
      rowsPerBand: Int,
      minEst: Double): DataFrame = {
    val mh = minhash(docs, n, numPerm)
    val bands = mh
      .withColumn("band", col("seed") divide lit(rowsPerBand) cast "int")
      .groupBy(col("doc_id"), col("band"))
      .agg(xxhash64(sort_array(collect_list(struct(col("seed"), col("mh"))))).as("band_key"))
    val cand = bands
      .toDF("a_id", "band", "band_key")
      .join(bands.toDF("b_id", "band", "band_key"), Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val sigA = mh.toDF("a_id", "seed", "mh_a")
    val sigB = mh.toDF("b_id", "seed", "mh_b")
    cand
      .join(sigA, Seq("a_id"))
      .join(sigB, Seq("b_id", "seed"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(
        round(
          sum(when(col("mh_a") === col("mh_b"), 1).otherwise(0)).cast("double") /
            lit(numPerm.toDouble),
          6).as("est_jaccard"))
      .filter(col("est_jaccard") >= lit(minEst))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** 64-bit SimHash signature per document: per-token xxhash64, each bit
    * votes ±1 weighted by term frequency; bit set where the vote is
    * positive. `(doc_id, simhash)`.
    *
    * One aggregation column per bit (64 codegen'd sums over the token rows)
    * instead of exploding 64 bit-rows per token — same math, 64× fewer
    * rows through the shuffle.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val votes = (0 until 64).map(b =>
      sum(expr(s"(shiftright(h, $b) & 1L) * 2 - 1")).as(s"v$b"))
    val sig = (0 until 64)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` bits, candidates blocked on
    * equal 8-bit bands: a pair within Hamming distance 7 differs in at most
    * 7 of the 8 bands, so it must agree on at least one (pigeonhole) —
    * recall is exact for `maxHamming ≤ 7`.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 7, "8-band blocking only guarantees recall for Hamming <= 7")
    val sig = simhash(docs)
    val banded = sig.select(
      col("doc_id"),
      col("simhash"),
      explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("band_val", expr("shiftright(simhash, band * 8) & 255L"))
    val a = banded.toDF("a_id", "sim_a", "band", "band_val")
    val b = banded.toDF("b_id", "sim_b", "band", "band_val")
    a.join(b, Seq("band", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= lit(maxHamming))
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
