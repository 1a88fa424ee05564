package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.SimilarityOps
import graft.sources.Tables

/** Similarity-search queries over `embeddings` (SURVEY §7.6).
  *
  * All three are DuckDB-oracled. `knn_cosine` is the exact brute-force
  * baseline (both engines compute sequential double sums, agreeing to well
  * past the 6 rounded decimals). `knn_lsh` / `knn_ivf` are the
  * sub-quadratic scale paths; their hyperplanes / centroid seeds derive
  * from the portable md5 hash ([[PortableHash]]) so the oracle reproduces
  * bucket assignment, probe lists, and therefore the exact candidate sets.
  * Recall vs brute force is additionally property-tested in SimilaritySpec.
  */
object SimilarityQueries {

  private val Dim = 64 // embeddings.embedding width (TESTDATA.md)
  private val Planes = 4
  private val NList = 16
  private val NProbe = 4
  private val KmK = 8
  private val KmIters = 2
  private val RerankC = 50
  private val CoresetK = 8
  private val PqM = 4 // PQ subspaces (16 dims each)
  private val PqKsub = 16 // PQ codebook size per subspace
  private val PqIters = 2 // PQ Lloyd iterations per subspace

  private def queriesAndCorpus(s: SparkSession, dir: String) = {
    val e = SimilarityOps.corpus(Tables.embeddings(s, dir))
    (e.filter(col("vec_id") % 50 === 0), e)
  }

  // conformal_state bin grid: value = cos + 1 ∈ [0, 2] → 200 linear bins
  // (nonnegative domain — the trunc-toward-zero quantize contract,
  // StreamingConformal scaladoc)
  private val ConfStateSpec =
    graft.core.BinSpec(0, 200, 0.0, graft.core.BinMethod.Linear)

  /** Shared scored relation behind `conformal_threshold` /
    * `conformal_by_label`'s marginal sibling and `conformal_state`:
    * score = cosine to the calibration-positives' exact integer-micro
    * centroid (truncated-mean components), calibration = even vec_ids.
    * Output: `(score_nano, label, is_calib)`.
    */
  private def conformalScored(s: SparkSession, dir: String): DataFrame =
    // session-memoized: conformal_threshold and conformal_state consume
    // the identical scored relation — one centroid fit + scoring pass per
    // session (the pqAdc sharing pattern)
    graft.operators.DedupOps.sessionRelation(
      Tables.embeddings(s, dir), "conformalScored") {
    val e = Tables.embeddings(s, dir)
    val vl = graft.operators.KMeansOps
      .quantize(e)
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
    val cent = vl
      .filter(col("vec_id") % 2 === 0 && col("label") === 1)
      .select(posexplode(col("vi")))
      .groupBy(col("pos"))
      .agg((sum(col("col")) / count(lit(1))).cast("long").cast("double").as("comp"))
      .agg(
        transform(
          sort_array(collect_list(struct(col("pos"), col("comp")))),
          x => x.getField("comp")).as("ci"))
      .withColumn("cc", graft.functions.GraftFunctions.dot(col("ci"), col("ci")))
    vl
      .crossJoin(broadcast(cent))
      .select(
        round(
          graft.functions.GraftFunctions.dot(col("vi"), col("ci"))
            / (sqrt(col("vv")) * sqrt(col("cc"))) * lit(1000000000.0))
          .cast("bigint").as("score_nano"),
        col("label"),
        (col("vec_id") % 2 === 0).as("is_calib"))
    }

  /** Per-label sibling of [[conformalScored]] (conformal_by_label /
    * conformal_state_by): each vector scored against its OWN label's
    * calibration centroid. Output: `(grp, score_nano, is_calib)`.
    */
  private def conformalScoredBy(s: SparkSession, dir: String): DataFrame =
    // session-memoized like conformalScored: conformal_by_label and
    // conformal_state_by share one per-label centroid fit + scoring pass
    graft.operators.DedupOps.sessionRelation(
      Tables.embeddings(s, dir), "conformalScoredBy") {
    val e = Tables.embeddings(s, dir)
    val vl = graft.operators.KMeansOps
      .quantize(e)
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
    val cents = vl
      .filter(col("vec_id") % 2 === 0)
      .select(col("label"), posexplode(col("vi")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col")) / count(lit(1))).cast("long").cast("double").as("comp"))
      .groupBy(col("label"))
      .agg(
        transform(
          sort_array(collect_list(struct(col("pos"), col("comp")))),
          x => x.getField("comp")).as("ci"))
      .withColumn("cc", graft.functions.GraftFunctions.dot(col("ci"), col("ci")))
    vl
      .join(broadcast(cents), Seq("label"))
      .select(
        col("label").as("grp"),
        round(
          graft.functions.GraftFunctions.dot(col("vi"), col("ci"))
            / (sqrt(col("vv")) * sqrt(col("cc"))) * lit(1000000000.0))
          .cast("bigint").as("score_nano"),
        (col("vec_id") % 2 === 0).as("is_calib"))
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
      SimilarityOps.knnLsh(q, c, k = 10, numPlanes = Planes, dim = Dim)
    }),
    // IVF scale path: 16 inverted lists, probe the 4 nearest.
    "knn_ivf" -> ((s, dir) => {
      val (q, c) = queriesAndCorpus(s, dir)
      SimilarityOps.knnIvf(q, c, k = 10, nlist = NList, nprobe = NProbe)
    }),
    // Two-stage retrieval: SQ8 integer-dot prefilter (top-50 shortlist
    // per query over 1-byte-per-dim codes) + exact cosine rerank — the
    // memory-bound production ANN shape.
    "knn_rerank" -> ((s, dir) => {
      val (q, c) = queriesAndCorpus(s, dir)
      SimilarityOps.knnRerank(q, c, k = 10, rerank = RerankC)
    }),
    // Lloyd k-means in exact integer micro-space (KMeansOps): 8 clusters,
    // 2 iterations, per-cluster size + inertia.
    "embed_kmeans" -> ((s, dir) =>
      graft.operators.KMeansOps.fitSummary(Tables.embeddings(s, dir), k = KmK, iters = KmIters)),
    // SSL-prototypes pruning: keep the 3/4 of each cluster closest to its
    // centroid; exact integer distance sums on both sides of the cut.
    "embed_prototypes" -> ((s, dir) =>
      graft.operators.KMeansOps.prototypeSummary(
        Tables.embeddings(s, dir), k = KmK, iters = KmIters)),
    // Do the k-means clusters recover the labels beyond chance? Adjusted
    // Rand Index between the same deterministic fit's assignment and the
    // label column — integer pair-counting over the 8×|labels|
    // contingency.
    "cluster_ari" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val a = graft.operators.KMeansOps.fitAssign(e, k = KmK, iters = KmIters)
        .select(col("vec_id"), col("cid"))
      graft.operators.EvalOps.adjustedRandIndex(
        a.join(e.select(col("vec_id"), col("label")), Seq("vec_id")),
        "cid", "label")
    }),
    // Cluster-quality gauge on the same fit: simplified silhouette
    // (centroid-distance form — the O(n·k) statistic, exact integer
    // micro² distances, nano-quantized per-vector scores).
    "cluster_silhouette" -> ((s, dir) =>
      graft.operators.KMeansOps.silhouetteSummary(
        Tables.embeddings(s, dir), k = KmK, iters = KmIters)),
    // ARI's information-theoretic companion on the same fit: normalized
    // mutual information between clusters and labels (integer-nano
    // entropies; the N·1e9 scale cancels in the ratio).
    "cluster_nmi" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val a = graft.operators.KMeansOps.fitAssign(e, k = KmK, iters = KmIters)
        .select(col("vec_id"), col("cid"))
      graft.operators.EvalOps.nmiFromPartitions(
        a.join(e.select(col("vec_id"), col("label")), Seq("vec_id")),
        "cid", "label")
    }),
    // SemDeDup: the same k-means fit, then near-dup pruning ONLY within a
    // cluster — the scale path for embedding dedup (dedup_embedding is the
    // exact all-pairs baseline it approximates). Threshold matches the
    // baseline's 0.4 so the two surfaces are directly comparable.
    "dedup_semantic" -> ((s, dir) =>
      SimilarityOps.semanticDedup(
        Tables.embeddings(s, dir), k = KmK, iters = KmIters, minCos = 0.4)),
    // Recall@10 of the LSH scale path against the exact baseline — the
    // quality gate an ANN deployment monitors. One summary row; the hit
    // count is an exact-integer join intersection, so the metric itself is
    // oracle-hashable (both top-k pipelines were already bit-exact).
    // Int8 scalar quantization summary per dimension (range, saturation,
    // mean reconstruction error) — the compression step before ANN.
    "embed_quantize" -> ((s, dir) =>
      graft.operators.TrainsetOps.quantizeEmbeddings(Tables.embeddings(s, dir))),
    "ann_recall" -> ((s, dir) => {
      val (q, c) = queriesAndCorpus(s, dir)
      // bf feeds BOTH the exact-count agg and the hit join — persist so
      // the O(|Q|·N) cross join + per-query top-k window runs once, not
      // twice (measured 5.97 s unpersisted at sf0.1)
      val bf = graft.operators.DedupOps.registerCache(
        SimilarityOps
          .knnBruteForce(q, c, k = 10)
          .select(col("q_id"), col("c_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val lsh = SimilarityOps
        .knnLsh(q, c, k = 10, numPlanes = Planes, dim = Dim)
        .select(col("q_id"), col("c_id"))
      val nQ = bf.agg(countDistinct(col("q_id")).as("n_queries"), count(lit(1)).as("n_exact"))
      val hits = bf.join(lsh, Seq("q_id", "c_id")).agg(count(lit(1)).as("n_hits"))
      nQ.crossJoin(hits)
        .select(
          col("n_queries"),
          col("n_exact"),
          col("n_hits"),
          round(col("n_hits").cast("double") / col("n_exact").cast("double"), 6)
            .as("recall"))
    }),
    // k-NN label-agreement audit: per-label neighborhood purity over the
    // probe slice; suspect = probes whose neighbor majority disagrees.
    "label_noise" -> ((s, dir) =>
      SimilarityOps.labelNoise(Tables.embeddings(s, dir), k = 10, probeEvery = 50)),
    // Distance view of mislabel detection: top-3 farthest members from
    // their own label's exact integer-micro centroid.
    "label_outliers" -> ((s, dir) =>
      graft.operators.KMeansOps.labelOutliers(Tables.embeddings(s, dir), topK = 3)),
    // ANN planning: bucket occupancy + avg candidate-list size for
    // 2/4/6-plane LSH configs from one projection pass.
    "lsh_tuning" -> ((s, dir) =>
      SimilarityOps.lshTuning(Tables.embeddings(s, dir), dim = Dim, planeCounts = Seq(2, 4, 6))),
    // Greedy k-center coreset: the 8 most mutually-distant vectors (exact
    // integer micro² distances, deterministic seed + tie-breaks) — the
    // diverse-subset picker for labeling/inspection budgets.
    "coreset_kcenter" -> ((s, dir) =>
      graft.operators.TrainsetOps.kcenterCoreset(Tables.embeddings(s, dir), k = CoresetK)),
    // Split-conformal selective classification at α=0.1: score = cosine
    // to the calibration-positives' exact integer-micro centroid
    // (truncated-mean components, the label_outliers arithmetic),
    // calibration = even vec_ids, test = odd. EvalOps.conformalCoverage
    // sets the finite-sample (1−α) cutoff on the calibration positives
    // and reports positive-class test coverage — the ≥ 0.9 marginal
    // guarantee readout. Scale: the only ORDER BY runs over calibration
    // positives (sampled-small by construction); scoring is one
    // broadcast-centroid codegen projection.
    "conformal_threshold" -> ((s, dir) =>
      graft.operators.EvalOps.conformalCoverage(
        conformalScored(s, dir), alphaNum = 1L, alphaDen = 10L)),
    // Streaming twin of conformal_threshold: the same scored relation,
    // folded into two StreamingQuantiles bin-count states (calibration
    // positives / test positives; value = cos + 1 — the nonnegative
    // domain the trunc-toward-zero quantize requires) and read back as a
    // one-row cutoff + coverage BRACKET (StreamingConformal). The batch
    // thr_nano provably lies in [thr_lo, thr_hi) and batch n_covered in
    // [n_cov_lo, n_cov_hi] — StreamingConformalSpec pins both; this
    // query oracles the state readout itself.
    "conformal_state" -> ((s, dir) => {
      val scored = conformalScored(s, dir)
        .select(
          (col("score_nano").cast("double") / lit(1000000000.0) + lit(1.0)).as("value"),
          col("label"), col("is_calib"))
        .filter(col("label") === 1)
      graft.streaming.StreamingConformal.coverageFromState(
        graft.streaming.StreamingQuantiles.binCounts(
          scored.filter(col("is_calib")).select(col("value")), ConfStateSpec),
        graft.streaming.StreamingQuantiles.binCounts(
          scored.filter(!col("is_calib")).select(col("value")), ConfStateSpec),
        ConfStateSpec, alphaNum = 1L, alphaDen = 10L)
    }),
    // Hybrid retrieval: reciprocal-rank fusion (k0=60) of the lexical
    // BM25 top-20 (fixed term bag, CurationOps.bm25) and the dense
    // cosine top-20 around probe vector 0 — the calibration-free
    // lexical+dense hybrid every RAG retrieval stack ships. Only ranks
    // cross the fusion boundary; contributions are exact nano-quantized
    // integers (RankOps.rrfFuse).
    "hybrid_rrf" -> ((s, dir) => {
      val bm = graft.operators.CurationOps
        .bm25(Tables.documents(s, dir), CurationQueries.Bm25Terms, topK = 20)
        .select(col("doc_id"), col("rank"))
      val e = SimilarityOps.corpus(Tables.embeddings(s, dir))
      val kn = SimilarityOps
        .knnBruteForce(e.filter(col("vec_id") === 0), e, k = 20)
        .select(col("c_id").as("doc_id"), col("rank"))
      graft.operators.RankOps.rrfFuse(Seq(bm, kn), k0 = 60, topK = 20)
    }),
    // Mondrian (class-conditional) conformal: each vector scored against
    // its OWN label's calibration centroid, one α=0.1 cutoff per label,
    // per-label test coverage — the slice-conditional guarantee
    // (EvalOps.conformalCoverageBy). Calibration = even vec_ids.
    "conformal_by_label" -> ((s, dir) =>
      graft.operators.EvalOps.conformalCoverageBy(
        conformalScoredBy(s, dir), alphaNum = 1L, alphaDen = 10L)),
    // Mondrian streaming twin: the same per-label scored relation folded
    // into GROUPED StreamingQuantiles states (grp = label) and read back
    // as one cutoff + coverage bracket per label
    // (StreamingConformal.coverageFromStateBy) — the class-conditional
    // monitor form of conformal_state.
    "conformal_state_by" -> ((s, dir) => {
      val scored = conformalScoredBy(s, dir)
        .select(
          col("grp"),
          (col("score_nano").cast("double") / lit(1000000000.0) + lit(1.0)).as("value"),
          col("is_calib"))
      graft.streaming.StreamingConformal.coverageFromStateBy(
        graft.streaming.StreamingQuantiles.binCountsBy(
          scored.filter(col("is_calib")).select(col("grp"), col("value")),
          ConfStateSpec, Seq("grp")),
        graft.streaming.StreamingQuantiles.binCountsBy(
          scored.filter(!col("is_calib")).select(col("grp"), col("value")),
          ConfStateSpec, Seq("grp")),
        ConfStateSpec, alphaNum = 1L, alphaDen = 10L)
    }),
    // IVF with the TRAINED coarse quantizer (Lloyd centroids, k=8 lists,
    // probe 4) — the production IVF beside knn_ivf's hash-sampled
    // quantizer; assignment/probe/scoring all in the exact integer-micro²
    // k-means metric, oracle reuses the unrolled Lloyd chain.
    "knn_ivf_trained" -> ((s, dir) =>
      SimilarityOps.knnIvfTrained(
        Tables.embeddings(s, dir),
        k = 10, nlist = KmK, iters = KmIters, nprobe = 4, probeEvery = 50)),
    // Recall gate for the trained quantizer: top-10 overlap of the
    // nprobe=4 trained IVF against exact brute-force L2 in the SAME
    // integer-micro² metric — the ann_recall/pq_recall sibling closing
    // the recall-gate set over the whole ANN ladder.
    "ivf_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val bf = graft.operators.DedupOps.registerCache(
        SimilarityOps
          .knnBruteForceL2(e, k = 10, probeEvery = 50)
          .select(col("q_id"), col("c_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val ivf = SimilarityOps
        .knnIvfTrained(e, k = 10, nlist = KmK, iters = KmIters, nprobe = 4, probeEvery = 50)
        .select(col("q_id"), col("c_id"))
      val nQ = bf.agg(
        countDistinct(col("q_id")).as("n_queries"), count(lit(1)).as("n_exact"))
      val hits = bf.join(ivf, Seq("q_id", "c_id")).agg(count(lit(1)).as("n_hits"))
      nQ.crossJoin(hits)
        .select(
          col("n_queries"), col("n_exact"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_exact").cast("double"), 6)
            .as("recall"))
    }),
    // Product-quantization ADC: 4 subspaces × 16-centroid integer-micro
    // codebooks, corpus encoded to 4 codes/vector, probe queries answered
    // by exact distance-table sums — the memory-bound ANN regime
    // (SimilarityOps.knnPq) completing the brute/LSH/IVF/SQ8 ladder.
    "knn_pq" -> ((s, dir) =>
      SimilarityOps.knnPq(
        Tables.embeddings(s, dir),
        k = 10, m = PqM, ksub = PqKsub, iters = PqIters, probeEvery = 50, dim = Dim)),
    // Retrieval-quality readout of the exact kNN index: NDCG@10 + MRR
    // with label-match relevance over the probe slice — the graded IR
    // metric beside the recall gates (SimilarityOps.knnRankingQuality).
    "knn_ndcg" -> ((s, dir) =>
      SimilarityOps.knnRankingQuality(Tables.embeddings(s, dir), k = 10, probeEvery = 50)),
    // Newman modularity of the SEMANTIC partition over the NEAR-DUP
    // graph: do the k-means clusters concentrate the cosine-0.4 pair
    // edges (Q > 0 → SemDeDup's within-cluster pruning is seeing most
    // of the duplication; Q ≈ 0 → near-dups cross clusters and the
    // pruning leaks)? Exact integer edge/degree sums; one double
    // projection. The cross-family audit tying the dedup and
    // clustering surfaces together.
    "semantic_modularity" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val a = graft.operators.KMeansOps
        .fitAssign(e, k = KmK, iters = KmIters)
        .select(col("vec_id").as("node"), col("cid"))
      graft.operators.ClusterOps.modularity(
        SimilarityOps.nearDupPairs(e, minCos = 0.4).select(col("a_id"), col("b_id")),
        a)
    }),
    // TwoNN intrinsic-dimension estimate over a 1/5 probe slice: does
    // the 64-dim embedding carry 64 dimensions of signal? d̂ = n/Σln(r2/r1)
    // on squared integer-micro distances (no sqrt needed) — the
    // embedding-quality gauge before sizing PQ/LSH configs.
    "embed_intrinsic_dim" -> ((s, dir) =>
      SimilarityOps.intrinsicDim(Tables.embeddings(s, dir), probeEvery = 5)),
    // Shortlist recall of the PQ-ADC path: how much of the exact-L2
    // top-10 survives into the 50-candidate ADC shortlist — the number a
    // PQ+rerank deployment actually gates on (the reranker recovers the
    // order of whatever the shortlist retains). Same probe slice and
    // quantization on both sides; 0.45 here vs ~0.10 for a random
    // shortlist on this corpus.
    "pq_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val bf = graft.operators.DedupOps.registerCache(
        SimilarityOps
          .knnBruteForceL2(e, k = 10, probeEvery = 50)
          .select(col("q_id"), col("c_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val pq = SimilarityOps
        .knnPq(e, k = 50, m = PqM, ksub = PqKsub, iters = PqIters, probeEvery = 50, dim = Dim)
        .select(col("q_id"), col("c_id"))
      val nQ = bf.agg(countDistinct(col("q_id")).as("n_queries"), count(lit(1)).as("n_exact"))
      val hits = bf.join(pq, Seq("q_id", "c_id")).agg(count(lit(1)).as("n_hits"))
      nQ.crossJoin(hits)
        .select(
          col("n_queries"), col("n_exact"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_exact").cast("double"), 6)
            .as("recall"))
    }))

  /** The exact plane vector the engine uses, as a DuckDB list literal
    * built from the SAME integer hash values ([[SimilarityOps.planeInts]])
    * with the SAME arithmetic (`k/10^6 − 0.5` in IEEE double) —
    * bit-identical components.
    */
  private def planeSqlLiteral(p: Int): String =
    SimilarityOps
      .planeInts(p, Dim)
      .map(k => s"(CAST($k AS DOUBLE) / 1000000.0 - 0.5)")
      .mkString("[", ", ", "]")

  private val cosSql =
    (a: String, b: String) =>
      s"""round(list_dot_product($a, $b)
         |  / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin

  /** Per-subspace PQ CTE chain (seeds → one Lloyd update → codes +
    * query distance table), mirroring SimilarityOps.knnPq bit-for-bit.
    */
  private def pqOracle(k: Int): String = {
    val seedHash = PortableHash.hash60Sql("'km:' || CAST(vec_id AS VARCHAR)")
    val dsub = Dim / PqM
    def subChain(s: Int): String = {
      val lo = s * dsub + 1
      val hi = (s + 1) * dsub
      s"""w$s AS (
         |  SELECT vec_id, vi[$lo:$hi] AS vi,
         |         list_dot_product(vi[$lo:$hi], vi[$lo:$hi]) AS vv
         |  FROM v
         |), c${s}_0 AS (
         |  SELECT CAST(rn - 1 AS INT) AS cid, vi[$lo:$hi] AS ci
         |  FROM seed WHERE rn <= $PqKsub
         |), a${s}_1 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT w.vec_id, c.cid,
         |           row_number() OVER (PARTITION BY w.vec_id ORDER BY
         |             w.vv + list_dot_product(c.ci, c.ci)
         |               - 2 * list_dot_product(w.vi, c.ci), c.cid) AS rn
         |    FROM w$s w CROSS JOIN c${s}_0 c) WHERE rn = 1
         |), m${s}_1 AS (
         |  SELECT a.cid, g.i AS pos,
         |         CAST(CAST(trunc(sum(w.vi[g.i]) / count(*)) AS BIGINT) AS DOUBLE) AS comp
         |  FROM a${s}_1 a JOIN w$s w ON a.vec_id = w.vec_id
         |  CROSS JOIN generate_series(1, $dsub) AS g(i)
         |  GROUP BY 1, 2
         |), c${s}_1 AS (
         |  SELECT cid, list(comp ORDER BY pos) AS ci FROM m${s}_1 GROUP BY cid
         |), aF$s AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT w.vec_id, c.cid,
         |           row_number() OVER (PARTITION BY w.vec_id ORDER BY
         |             w.vv + list_dot_product(c.ci, c.ci)
         |               - 2 * list_dot_product(w.vi, c.ci), c.cid) AS rn
         |    FROM w$s w CROSS JOIN c${s}_1 c) WHERE rn = 1
         |), qt$s AS (
         |  SELECT w.vec_id AS q_id, c.cid,
         |         CAST(w.vv + list_dot_product(c.ci, c.ci)
         |              - 2 * list_dot_product(w.vi, c.ci) AS BIGINT) AS d
         |  FROM w$s w CROSS JOIN c${s}_1 c WHERE w.vec_id % 50 = 0
         |)""".stripMargin
    }
    val codesUnion = (0 until PqM)
      .map(s => s"SELECT vec_id AS c_id, $s AS s, cid FROM aF$s")
      .mkString("\n       |  UNION ALL\n       |  ")
    val dtUnion = (0 until PqM)
      .map(s => s"SELECT q_id, $s AS s, cid, d FROM qt$s")
      .mkString("\n       |  UNION ALL\n       |  ")
    s"""WITH v AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS vi
       |  FROM embeddings
       |), seed AS (
       |  SELECT vec_id, vi, row_number() OVER (ORDER BY $seedHash, vec_id) AS rn FROM v
       |), ${(0 until PqM).map(subChain).mkString(", ")}, codes AS (
       |  $codesUnion
       |), dt AS (
       |  $dtUnion
       |), p AS (
       |  SELECT dt.q_id, codes.c_id, CAST(sum(dt.d) AS BIGINT) AS adist
       |  FROM codes JOIN dt ON dt.s = codes.s AND dt.cid = codes.cid
       |  WHERE dt.q_id <> codes.c_id
       |  GROUP BY 1, 2
       |), r AS (
       |  SELECT q_id, c_id, adist,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS INT)
       |           AS rank
       |  FROM p
       |)
       |SELECT q_id, c_id, rank, adist FROM r WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "knn_pq" -> pqOracle(10),
    "knn_ndcg" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), q AS (
         |  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 50 = 0
         |), p0 AS (
         |  SELECT q_id, e.vec_id AS c_id, ${cosSql("q_emb", "e.emb")} AS cos
         |  FROM q, e WHERE e.vec_id <> q.q_id
         |), r0 AS (
         |  SELECT q_id, c_id, rank FROM (
         |    SELECT q_id, c_id,
         |           CAST(row_number() OVER (PARTITION BY q_id
         |             ORDER BY cos DESC, c_id) AS INT) AS rank
         |    FROM p0) WHERE rank <= 10
         |), lc AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS n_lbl FROM embeddings GROUP BY 1
         |), rl AS (
         |  SELECT r0.q_id, r0.rank,
         |         CASE WHEN la.label = lb.label THEN CAST(1 AS BIGINT)
         |              ELSE CAST(0 AS BIGINT) END AS rel,
         |         coalesce(lc.n_lbl, 1) - 1 AS r_corpus,
         |         CAST(round(1e9 * (ln(2.0) / ln(CAST(r0.rank AS DOUBLE) + 1.0)))
         |              AS BIGINT) AS dn
         |  FROM r0
         |  JOIN embeddings la ON la.vec_id = r0.q_id
         |  JOIN embeddings lb ON lb.vec_id = r0.c_id
         |  LEFT JOIN lc ON lc.label = la.label
         |), w AS (
         |  SELECT q_id, rank, rel, r_corpus, dn,
         |         CAST(sum(rel) OVER (PARTITION BY q_id) AS BIGINT) AS r_tot
         |  FROM rl
         |), pq AS (
         |  SELECT q_id, CAST(max(r_tot) AS BIGINT) AS r,
         |         CAST(sum(rel * dn) AS BIGINT) AS dcg_n,
         |         CAST(sum(CASE WHEN rank <= least(r_corpus, 10) THEN dn ELSE 0 END)
         |              AS BIGINT) AS idcg_n,
         |         min(CASE WHEN rel = 1 THEN rank END) AS first_rel
         |  FROM w GROUP BY 1
         |), sc AS (
         |  SELECT r,
         |         CASE WHEN r > 0 THEN
         |           CAST(round(1e9 * (CAST(dcg_n AS DOUBLE) / CAST(idcg_n AS DOUBLE)))
         |                AS BIGINT) ELSE 0 END AS nd,
         |         CASE WHEN first_rel IS NOT NULL THEN
         |           CAST(round(1e9 / CAST(first_rel AS DOUBLE)) AS BIGINT)
         |         ELSE 0 END AS rr
         |  FROM pq
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_rel,
         |       round(CAST(sum(nd) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9), 6)
         |         AS mean_ndcg,
         |       round(CAST(sum(rr) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9), 6)
         |         AS mrr
         |FROM sc""".stripMargin,
    "semantic_modularity" ->
      s"""$kmeansWithChain, ee AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), pp AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM ee a, ee b
         |  WHERE a.vec_id < b.vec_id
         |    AND round(list_dot_product(a.emb, b.emb)
         |              / (sqrt(list_dot_product(a.emb, a.emb))
         |                 * sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.4
         |), lab AS (
         |  SELECT pp.a_id, pp.b_id, ca.cid AS ca, cb.cid AS cb
         |  FROM pp
         |  JOIN aF ca ON ca.vec_id = pp.a_id
         |  JOIN aF cb ON cb.vec_id = pp.b_id
         |), mm AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m,
         |         CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
         |           AS within_edges
         |  FROM lab
         |), dg AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT ca AS cid FROM lab UNION ALL SELECT cb FROM lab)
         |  GROUP BY 1
         |), sq AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_clusters,
         |         CAST(sum(CAST(deg AS HUGEINT) * deg) AS BIGINT) AS sdeg2
         |  FROM dg
         |)
         |SELECT m, n_clusters, within_edges,
         |       round(CAST(within_edges AS DOUBLE) / CAST(m AS DOUBLE)
         |             - CAST(sdeg2 AS DOUBLE)
         |               / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6)
         |         AS q_modularity
         |FROM mm CROSS JOIN sq""".stripMargin,
    "embed_intrinsic_dim" ->
      s"""WITH v AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS vi
         |  FROM embeddings
         |), w AS (
         |  SELECT vec_id, vi, list_dot_product(vi, vi) AS vv FROM v
         |), q AS (
         |  SELECT vec_id AS q_id, vi AS qi, vv AS qq FROM w WHERE vec_id % 5 = 0
         |), dx AS (
         |  SELECT q.q_id, w.vec_id AS c_id,
         |         CAST(q.qq + w.vv - 2 * list_dot_product(q.qi, w.vi) AS BIGINT) AS dist
         |  FROM q, w WHERE w.vec_id <> q.q_id
         |), r AS (
         |  SELECT q_id, dist,
         |         row_number() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS rn
         |  FROM dx
         |), p AS (
         |  SELECT q_id,
         |         max(CASE WHEN rn = 1 THEN dist END) AS d1,
         |         max(CASE WHEN rn = 2 THEN dist END) AS d2
         |  FROM r WHERE rn <= 2 GROUP BY 1
         |  HAVING max(CASE WHEN rn = 2 THEN dist END) IS NOT NULL
         |), a AS (
         |  SELECT CAST(sum(CASE WHEN d1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_probes,
         |         CAST(sum(CASE WHEN d1 > 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_probes,
         |         CAST(sum(CASE WHEN d1 > 0 THEN
         |           CAST(round(1e9 * (0.5 * ln(CAST(d2 AS DOUBLE) / CAST(d1 AS DOUBLE))))
         |                AS BIGINT) ELSE 0 END) AS BIGINT) AS s_nano
         |  FROM p
         |)
         |SELECT n_probes, n_dup_probes,
         |       CASE WHEN s_nano > 0 THEN
         |         round(CAST(n_probes AS DOUBLE) / (CAST(s_nano AS DOUBLE) / 1e9), 6)
         |       END AS id_hat
         |FROM a""".stripMargin,
    "pq_recall" ->
      s"""WITH pq AS (
         |  ${pqOracle(50).replace("\n", "\n         |  ")}
         |), vx AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS vi
         |  FROM embeddings
         |), wx AS (
         |  SELECT vec_id, vi, list_dot_product(vi, vi) AS vv FROM vx
         |), qx AS (
         |  SELECT vec_id AS q_id, vi AS qi, vv AS qq FROM wx WHERE vec_id % 50 = 0
         |), dx AS (
         |  SELECT qx.q_id, wx.vec_id AS c_id,
         |         CAST(qx.qq + wx.vv - 2 * list_dot_product(qx.qi, wx.vi) AS BIGINT) AS dist
         |  FROM qx, wx WHERE wx.vec_id <> qx.q_id
         |), bf AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT dx.*, row_number() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS rn
         |    FROM dx) WHERE rn <= 10
         |), st AS (
         |  SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries,
         |         CAST(count(*) AS BIGINT) AS n_exact
         |  FROM bf
         |), h AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_hits
         |  FROM bf JOIN pq USING (q_id, c_id)
         |)
         |SELECT n_queries, n_exact, n_hits,
         |       round(CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) AS recall
         |FROM st CROSS JOIN h""".stripMargin,
    "conformal_threshold" ->
      s"""WITH v AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS vi
         |  FROM embeddings
         |), w AS (
         |  SELECT vec_id, vi, list_dot_product(vi, vi) AS vv FROM v
         |), l AS (
         |  SELECT w.vec_id, w.vi, w.vv, e.label
         |  FROM w JOIN embeddings e USING (vec_id)
         |), m AS (
         |  SELECT g.i AS pos,
         |         CAST(CAST(trunc(sum(vi[g.i]) / count(*)) AS BIGINT) AS DOUBLE) AS comp
         |  FROM l CROSS JOIN generate_series(1, $Dim) AS g(i)
         |  WHERE vec_id % 2 = 0 AND label = 1
         |  GROUP BY 1
         |), c AS (
         |  SELECT list(comp ORDER BY pos) AS ci FROM m
         |), sc AS (
         |  SELECT l.vec_id,
         |         CAST(round(list_dot_product(l.vi, c.ci)
         |              / (sqrt(l.vv) * sqrt(list_dot_product(c.ci, c.ci)))
         |              * 1000000000.0) AS BIGINT) AS score_nano,
         |         l.label, l.vec_id % 2 = 0 AS is_calib
         |  FROM l, c
         |), cal AS (
         |  SELECT score_nano AS s FROM sc WHERE is_calib AND label = 1
         |), st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_calib FROM cal
         |), r AS (
         |  SELECT s, row_number() OVER (ORDER BY s) AS rn FROM cal
         |), kq AS (
         |  SELECT n_calib, (9 * (n_calib + 1) + 9) // 10 AS k FROM st
         |), th AS (
         |  SELECT kq.n_calib,
         |         max(CASE WHEN r.rn = kq.n_calib - kq.k + 1 THEN r.s END) AS thr_nano
         |  FROM r CROSS JOIN kq GROUP BY kq.n_calib
         |), te AS (
         |  SELECT th.n_calib, th.thr_nano,
         |         CAST(count(*) AS BIGINT) AS n_test,
         |         CAST(sum(CASE WHEN th.thr_nano IS NULL
         |                            OR sc.score_nano >= th.thr_nano
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
         |  FROM sc CROSS JOIN th
         |  WHERE NOT sc.is_calib AND sc.label = 1
         |  GROUP BY 1, 2
         |)
         |SELECT n_calib, thr_nano, n_test, n_covered,
         |       round(CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE), 6) AS coverage
         |FROM te""".stripMargin,
    "conformal_state" ->
      s"""WITH v AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS vi
         |  FROM embeddings
         |), w AS (
         |  SELECT vec_id, vi, list_dot_product(vi, vi) AS vv FROM v
         |), l AS (
         |  SELECT w.vec_id, w.vi, w.vv, e.label
         |  FROM w JOIN embeddings e USING (vec_id)
         |), m AS (
         |  SELECT g.i AS pos,
         |         CAST(CAST(trunc(sum(vi[g.i]) / count(*)) AS BIGINT) AS DOUBLE) AS comp
         |  FROM l CROSS JOIN generate_series(1, $Dim) AS g(i)
         |  WHERE vec_id % 2 = 0 AND label = 1
         |  GROUP BY 1
         |), c AS (
         |  SELECT list(comp ORDER BY pos) AS ci FROM m
         |), sc AS (
         |  SELECT l.vec_id,
         |         CAST(round(list_dot_product(l.vi, c.ci)
         |              / (sqrt(l.vv) * sqrt(list_dot_product(c.ci, c.ci)))
         |              * 1000000000.0) AS BIGINT) AS score_nano,
         |         l.label, l.vec_id % 2 = 0 AS is_calib
         |  FROM l, c
         |), sv AS (
         |  -- value = cos + 1 (nonnegative domain), linear quantize ×100
         |  -- (trunc toward zero), numpy range semantics on [0, 200]
         |  SELECT CAST(trunc((CAST(score_nano AS DOUBLE) / 1000000000.0 + 1.0) * 100)
         |              AS BIGINT) AS code,
         |         is_calib
         |  FROM sc WHERE label = 1
         |), sb AS (
         |  SELECT CASE WHEN code = 200 THEN 199 ELSE code END AS bin, is_calib
         |  FROM sv WHERE code BETWEEN 0 AND 200
         |), gc AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS cnt FROM sb WHERE is_calib GROUP BY 1
         |), gt AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS cnt FROM sb WHERE NOT is_calib GROUP BY 1
         |), rc AS (
         |  SELECT bin, cnt,
         |         sum(cnt) OVER (ORDER BY bin
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         sum(cnt) OVER () AS n
         |  FROM gc
         |), loc AS (
         |  SELECT max(bin) AS thr_bin FROM (
         |    SELECT bin, cum, cum - cnt AS cum_prev,
         |           n - ((9 * (n + 1) + 9) // 10) + 1 AS r
         |    FROM rc) x
         |  WHERE r >= 1 AND r > cum_prev AND r <= cum
         |), nc AS (
         |  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_calib FROM gc
         |), ta AS (
         |  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_test,
         |         CAST(coalesce(sum(CASE WHEN loc.thr_bin IS NULL OR gt.bin > loc.thr_bin
         |                                THEN cnt ELSE 0 END), 0) AS BIGINT) AS n_cov_lo,
         |         CAST(coalesce(sum(CASE WHEN loc.thr_bin IS NULL OR gt.bin >= loc.thr_bin
         |                                THEN cnt ELSE 0 END), 0) AS BIGINT) AS n_cov_hi
         |  FROM gt CROSS JOIN loc
         |)
         |SELECT nc.n_calib, CAST(loc.thr_bin AS INT) AS thr_bin,
         |       CAST(loc.thr_bin AS DOUBLE) / 100.0 AS thr_lo,
         |       CAST(loc.thr_bin + 1 AS DOUBLE) / 100.0 AS thr_hi,
         |       ta.n_test, ta.n_cov_lo, ta.n_cov_hi,
         |       CASE WHEN ta.n_test > 0
         |            THEN round(CAST(ta.n_cov_lo AS DOUBLE) / CAST(ta.n_test AS DOUBLE), 6)
         |       END AS cov_lo,
         |       CASE WHEN ta.n_test > 0
         |            THEN round(CAST(ta.n_cov_hi AS DOUBLE) / CAST(ta.n_test AS DOUBLE), 6)
         |       END AS cov_hi
         |FROM nc CROSS JOIN loc CROSS JOIN ta""".stripMargin,
    "conformal_by_label" ->
      s"""WITH v AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS vi
         |  FROM embeddings
         |), w AS (
         |  SELECT vec_id, vi, list_dot_product(vi, vi) AS vv FROM v
         |), l AS (
         |  SELECT w.vec_id, w.vi, w.vv, e.label
         |  FROM w JOIN embeddings e USING (vec_id)
         |), m AS (
         |  SELECT label, g.i AS pos,
         |         CAST(CAST(trunc(sum(vi[g.i]) / count(*)) AS BIGINT) AS DOUBLE) AS comp
         |  FROM l CROSS JOIN generate_series(1, $Dim) AS g(i)
         |  WHERE vec_id % 2 = 0
         |  GROUP BY 1, 2
         |), c AS (
         |  SELECT label, list(comp ORDER BY pos) AS ci,
         |         list_dot_product(list(comp ORDER BY pos),
         |                          list(comp ORDER BY pos)) AS cc
         |  FROM m GROUP BY 1
         |), sc AS (
         |  SELECT l.label AS grp,
         |         CAST(round(list_dot_product(l.vi, c.ci)
         |              / (sqrt(l.vv) * sqrt(c.cc))
         |              * 1000000000.0) AS BIGINT) AS score_nano,
         |         l.vec_id % 2 = 0 AS is_calib
         |  FROM l JOIN c ON c.label = l.label
         |), cal AS (
         |  SELECT grp, score_nano AS s,
         |         row_number() OVER (PARTITION BY grp ORDER BY score_nano) AS rn,
         |         CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n_calib
         |  FROM sc WHERE is_calib
         |), th AS (
         |  SELECT grp, max(n_calib) AS n_calib,
         |         max(CASE WHEN rn = n_calib - ((9 * (n_calib + 1) + 9) // 10) + 1
         |                  THEN s END) AS thr_nano
         |  FROM cal GROUP BY 1
         |), te AS (
         |  SELECT sc.grp,
         |         CAST(count(*) AS BIGINT) AS n_test,
         |         CAST(sum(CASE WHEN th.thr_nano IS NULL
         |                            OR sc.score_nano >= th.thr_nano
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
         |  FROM sc LEFT JOIN th ON th.grp = sc.grp
         |  WHERE NOT sc.is_calib
         |  GROUP BY 1
         |)
         |SELECT coalesce(th.grp, te.grp) AS grp,
         |       coalesce(th.n_calib, 0) AS n_calib, th.thr_nano,
         |       coalesce(te.n_test, 0) AS n_test,
         |       coalesce(te.n_covered, 0) AS n_covered,
         |       CASE WHEN coalesce(te.n_test, 0) > 0
         |            THEN round(CAST(te.n_covered AS DOUBLE)
         |                       / CAST(te.n_test AS DOUBLE), 6) END AS coverage
         |FROM th FULL OUTER JOIN te ON th.grp = te.grp
         |ORDER BY grp""".stripMargin,
    "conformal_state_by" ->
      s"""WITH v AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS vi
         |  FROM embeddings
         |), w AS (
         |  SELECT vec_id, vi, list_dot_product(vi, vi) AS vv FROM v
         |), l AS (
         |  SELECT w.vec_id, w.vi, w.vv, e.label
         |  FROM w JOIN embeddings e USING (vec_id)
         |), m AS (
         |  SELECT label, g.i AS pos,
         |         CAST(CAST(trunc(sum(vi[g.i]) / count(*)) AS BIGINT) AS DOUBLE) AS comp
         |  FROM l CROSS JOIN generate_series(1, $Dim) AS g(i)
         |  WHERE vec_id % 2 = 0
         |  GROUP BY 1, 2
         |), c AS (
         |  SELECT label, list(comp ORDER BY pos) AS ci,
         |         list_dot_product(list(comp ORDER BY pos),
         |                          list(comp ORDER BY pos)) AS cc
         |  FROM m GROUP BY 1
         |), sc AS (
         |  SELECT l.label AS grp,
         |         CAST(round(list_dot_product(l.vi, c.ci)
         |              / (sqrt(l.vv) * sqrt(c.cc))
         |              * 1000000000.0) AS BIGINT) AS score_nano,
         |         l.vec_id % 2 = 0 AS is_calib
         |  FROM l JOIN c ON c.label = l.label
         |), sv AS (
         |  SELECT grp,
         |         CAST(trunc((CAST(score_nano AS DOUBLE) / 1000000000.0 + 1.0) * 100)
         |              AS BIGINT) AS code,
         |         is_calib
         |  FROM sc
         |), sb AS (
         |  SELECT grp, CASE WHEN code = 200 THEN 199 ELSE code END AS bin, is_calib
         |  FROM sv WHERE code BETWEEN 0 AND 200
         |), gc AS (
         |  SELECT grp, bin, CAST(count(*) AS BIGINT) AS cnt
         |  FROM sb WHERE is_calib GROUP BY 1, 2
         |), gt AS (
         |  SELECT grp, bin, CAST(count(*) AS BIGINT) AS cnt
         |  FROM sb WHERE NOT is_calib GROUP BY 1, 2
         |), rc AS (
         |  SELECT grp, bin, cnt,
         |         sum(cnt) OVER (PARTITION BY grp ORDER BY bin
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         sum(cnt) OVER (PARTITION BY grp) AS n
         |  FROM gc
         |), loc AS (
         |  SELECT grp, max(bin) AS thr_bin FROM (
         |    SELECT grp, bin, cum, cum - cnt AS cum_prev,
         |           n - ((9 * (n + 1) + 9) // 10) + 1 AS r
         |    FROM rc) x
         |  WHERE r >= 1 AND r > cum_prev AND r <= cum
         |  GROUP BY 1
         |), nc AS (
         |  SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_calib FROM gc GROUP BY 1
         |), thr AS (
         |  SELECT nc.grp, nc.n_calib, CAST(loc.thr_bin AS INT) AS thr_bin,
         |         CAST(loc.thr_bin AS DOUBLE) / 100.0 AS thr_lo,
         |         CAST(loc.thr_bin + 1 AS DOUBLE) / 100.0 AS thr_hi
         |  FROM nc LEFT JOIN loc ON loc.grp = nc.grp
         |), ta AS (
         |  SELECT gt.grp, CAST(sum(cnt) AS BIGINT) AS n_test,
         |         CAST(sum(CASE WHEN thr.thr_bin IS NULL OR gt.bin > thr.thr_bin
         |                       THEN cnt ELSE 0 END) AS BIGINT) AS n_cov_lo,
         |         CAST(sum(CASE WHEN thr.thr_bin IS NULL OR gt.bin >= thr.thr_bin
         |                       THEN cnt ELSE 0 END) AS BIGINT) AS n_cov_hi
         |  FROM gt LEFT JOIN thr ON thr.grp = gt.grp
         |  GROUP BY 1
         |)
         |SELECT coalesce(thr.grp, ta.grp) AS grp,
         |       coalesce(thr.n_calib, 0) AS n_calib,
         |       thr.thr_bin, thr.thr_lo, thr.thr_hi,
         |       coalesce(ta.n_test, 0) AS n_test,
         |       coalesce(ta.n_cov_lo, 0) AS n_cov_lo,
         |       coalesce(ta.n_cov_hi, 0) AS n_cov_hi,
         |       CASE WHEN coalesce(ta.n_test, 0) > 0
         |            THEN round(CAST(ta.n_cov_lo AS DOUBLE)
         |                       / CAST(ta.n_test AS DOUBLE), 6) END AS cov_lo,
         |       CASE WHEN coalesce(ta.n_test, 0) > 0
         |            THEN round(CAST(ta.n_cov_hi AS DOUBLE)
         |                       / CAST(ta.n_test AS DOUBLE), 6) END AS cov_hi
         |FROM thr FULL OUTER JOIN ta ON ta.grp = thr.grp
         |ORDER BY grp""".stripMargin,
    "hybrid_rrf" -> {
      val contribOf = (rankExpr: String) =>
        s"CAST(round(1000000000.0 / (CAST(60 AS DOUBLE) + CAST($rankExpr AS DOUBLE))) AS BIGINT)"
      s"""WITH bm AS (
         |  ${CurationQueries.oracle("bm25_search")}
         |), e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), qv AS (
         |  SELECT emb AS q_emb FROM e WHERE vec_id = 0
         |), kn0 AS (
         |  SELECT e.vec_id AS doc_id, ${cosSql("q_emb", "e.emb")} AS cos
         |  FROM e, qv WHERE e.vec_id <> 0
         |), kn AS (
         |  SELECT doc_id, rank FROM (
         |    SELECT doc_id,
         |           CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT) AS rank
         |    FROM kn0) WHERE rank <= 20
         |), u AS (
         |  SELECT doc_id, ${contribOf("rank")} AS c FROM bm
         |  UNION ALL
         |  SELECT doc_id, ${contribOf("rank")} AS c FROM kn
         |), f AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
         |         CAST(sum(c) AS BIGINT) AS rrf_nano
         |  FROM u GROUP BY 1
         |), r AS (
         |  SELECT doc_id, n_lists, rrf_nano,
         |         CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id) AS INT) AS rank
         |  FROM f
         |)
         |SELECT doc_id, n_lists, rrf_nano, rank FROM r WHERE rank <= 20
         |ORDER BY rank""".stripMargin
    },
    "lsh_tuning" -> {
      val bit = (p: Int) =>
        s"CASE WHEN round(list_dot_product(emb, ${planeSqlLiteral(p)}), 6) > 0 " +
          s"THEN ${1L << p} ELSE 0 END"
      val bmax = (0 until 6).map(bit).mkString("(", " + ", ")")
      s"""WITH e AS (
         |  SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), b AS (
         |  SELECT $bmax AS bmax FROM e
         |), u AS (
         |  SELECT p.planes, b.bmax & ((CAST(1 AS BIGINT) << p.planes) - 1) AS bucket
         |  FROM b CROSS JOIN (SELECT unnest([2, 4, 6]) AS planes) p
         |), c AS (
         |  SELECT planes, bucket, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1, 2
         |)
         |SELECT planes,
         |       CAST(count(*) AS BIGINT) AS n_buckets_used,
         |       CAST(max(c) AS BIGINT) AS max_bucket,
         |       round(CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
         |             / CAST(sum(c) AS DOUBLE), 6) AS avg_candidates
         |FROM c GROUP BY planes ORDER BY planes""".stripMargin
    },
    "label_outliers" ->
      s"""WITH v AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS vi
         |  FROM embeddings
         |), w AS (
         |  SELECT vec_id, vi, list_dot_product(vi, vi) AS vv FROM v
         |), l AS (
         |  SELECT w.vec_id, w.vi, w.vv, e.label
         |  FROM w JOIN embeddings e USING (vec_id)
         |), m AS (
         |  SELECT label, g.i AS pos,
         |         CAST(CAST(trunc(sum(vi[g.i]) / count(*)) AS BIGINT) AS DOUBLE) AS comp
         |  FROM l CROSS JOIN generate_series(1, $Dim) AS g(i)
         |  GROUP BY 1, 2
         |), c AS (
         |  SELECT label, list(comp ORDER BY pos) AS ci FROM m GROUP BY 1
         |), d AS (
         |  SELECT l.label, l.vec_id,
         |         CAST(l.vv + list_dot_product(c.ci, c.ci)
         |              - 2 * list_dot_product(l.vi, c.ci) AS BIGINT) AS dist
         |  FROM l JOIN c USING (label)
         |), r AS (
         |  SELECT label, vec_id, dist,
         |         CAST(row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id)
         |              AS INT) AS rk
         |  FROM d
         |)
         |SELECT label, rk, vec_id, dist FROM r WHERE rk <= 3
         |ORDER BY label, rk""".stripMargin,
    "label_noise" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), q AS (
         |  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 50 = 0
         |), p AS (
         |  SELECT q_id, e.vec_id AS c_id, ${cosSql("q_emb", "e.emb")} AS cos
         |  FROM q, e WHERE e.vec_id <> q.q_id
         |), r AS (
         |  SELECT q_id, c_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         |  FROM p
         |), pp AS (
         |  SELECT r.q_id, e1.label AS q_label,
         |         CAST(sum(CASE WHEN e2.label = e1.label THEN 1 ELSE 0 END) AS BIGINT) AS m
         |  FROM r
         |  JOIN embeddings e1 ON e1.vec_id = r.q_id
         |  JOIN embeddings e2 ON e2.vec_id = r.c_id
         |  WHERE r.rank <= 10
         |  GROUP BY 1, 2
         |)
         |SELECT q_label AS label,
         |       CAST(count(*) AS BIGINT) AS n_probes,
         |       round(CAST(sum(m) AS DOUBLE) / CAST(count(*) * 10 AS DOUBLE), 6)
         |         AS mean_agree,
         |       CAST(count(*) FILTER (WHERE m * 2 < 10) AS BIGINT) AS n_suspect
         |FROM pp GROUP BY 1 ORDER BY 1""".stripMargin,
    "knn_cosine" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), q AS (
         |  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 50 = 0
         |), p AS (
         |  SELECT q_id, e.vec_id AS c_id, ${cosSql("q_emb", "e.emb")} AS cos
         |  FROM q, e WHERE e.vec_id <> q.q_id
         |), r AS (
         |  SELECT q_id, c_id, cos,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS INT) AS rank
         |  FROM p
         |)
         |SELECT q_id, c_id, rank, cos FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "knn_lsh" -> {
      val bucket = (0 until Planes)
        .map(p =>
          s"CASE WHEN round(list_dot_product(emb, ${planeSqlLiteral(p)}), 6) > 0 " +
            s"THEN ${1L << p} ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), b AS (
         |  SELECT vec_id, emb, $bucket AS bucket FROM e
         |), q AS (
         |  SELECT vec_id AS q_id, emb AS q_emb, bucket FROM b WHERE vec_id % 50 = 0
         |), p AS (
         |  SELECT q_id, c.vec_id AS c_id, ${cosSql("q_emb", "c.emb")} AS cos
         |  FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.q_id
         |), r AS (
         |  SELECT q_id, c_id, cos,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS INT) AS rank
         |  FROM p
         |)
         |SELECT q_id, c_id, rank, cos FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },
    "coreset_kcenter" -> {
      // unrolled greedy stages: cI picks the arg-max of the running min
      // distance dI-1; every distance is the exact integer identity
      // a·a − 2a·b + b·b over micro-quantized components
      val d2 = (a: String, b: String) =>
        s"list_dot_product($a, $a) - 2 * list_dot_product($a, $b) + list_dot_product($b, $b)"
      val stages = (1 until CoresetK).map { i =>
        val prev = s"d${i - 1}"
        s"""c$i AS (SELECT vec_id, vi, md FROM $prev ORDER BY md DESC, vec_id LIMIT 1),
           |d$i AS (SELECT d.vec_id, d.vi, least(d.md, ${d2("d.vi", s"c$i.vi")}) AS md
           |        FROM $prev d, c$i)""".stripMargin
      }.mkString(",\n")
      val sels = (1 until CoresetK)
        .map(i => s"SELECT $i AS sel, vec_id, CAST(md AS BIGINT) AS dist2_micro FROM c$i")
        .mkString("\nUNION ALL\n")
      s"""WITH v AS (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> round(x * 1000000.0)) AS vi
         |  FROM embeddings
         |), c0 AS (SELECT vec_id, vi FROM v ORDER BY vec_id LIMIT 1),
         |d0 AS (SELECT v.vec_id, v.vi, ${d2("v.vi", "c0.vi")} AS md FROM v, c0),
         |$stages
         |SELECT 0 AS sel, vec_id, CAST(NULL AS BIGINT) AS dist2_micro FROM c0
         |UNION ALL
         |$sels
         |ORDER BY sel""".stripMargin
    },
    "knn_rerank" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), st AS (
         |  SELECT g.i AS dim, min(emb[g.i]) AS mn, max(emb[g.i]) - min(emb[g.i]) AS rg
         |  FROM e CROSS JOIN generate_series(1, $Dim) AS g(i)
         |  GROUP BY 1
         |), cd AS (
         |  SELECT vec_id,
         |         list(mn + ((CASE WHEN rg = 0 THEN 0.0
         |                     ELSE greatest(0.0, least(255.0,
         |                            floor((emb[dim] - mn) * 255.0 / rg))) END)
         |                    + 0.5) * rg / 255.0
         |              ORDER BY dim) AS cc
         |  FROM e CROSS JOIN st GROUP BY vec_id
         |), qd AS (
         |  SELECT vec_id AS q_id, cc AS qc FROM cd WHERE vec_id % 50 = 0
         |), s1 AS (
         |  SELECT q_id, c.vec_id AS c_id, ${cosSql("qc", "c.cc")} AS iscore
         |  FROM qd JOIN cd c ON c.vec_id <> qd.q_id
         |), sl AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY iscore DESC, c_id) AS srank
         |    FROM s1)
         |  WHERE srank <= $RerankC
         |), s2 AS (
         |  SELECT sl.q_id, sl.c_id, ${cosSql("eq.emb", "ec.emb")} AS cos
         |  FROM sl
         |  JOIN e eq ON eq.vec_id = sl.q_id
         |  JOIN e ec ON ec.vec_id = sl.c_id
         |), r AS (
         |  SELECT q_id, c_id, cos,
         |         CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY cos DESC, c_id) AS INT) AS rank
         |  FROM s2
         |)
         |SELECT q_id, c_id, rank, cos FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "knn_ivf" -> {
      val centHash = PortableHash.hash60Sql("CAST(vec_id AS VARCHAR)")
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), cents AS (
         |  SELECT vec_id AS cent_id, emb AS cent_emb FROM e
         |  ORDER BY $centHash LIMIT $NList
         |), ca AS (
         |  SELECT c_id, cent_id, c_emb FROM (
         |    SELECT e.vec_id AS c_id, e.emb AS c_emb, c.cent_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.emb", "c.cent_emb")} DESC, c.cent_id) AS rn
         |    FROM e, cents c)
         |  WHERE rn = 1
         |), qa AS (
         |  SELECT q_id, cent_id, q_emb FROM (
         |    SELECT e.vec_id AS q_id, e.emb AS q_emb, c.cent_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.emb", "c.cent_emb")} DESC, c.cent_id) AS rn
         |    FROM e, cents c WHERE e.vec_id % 50 = 0)
         |  WHERE rn <= $NProbe
         |), p AS (
         |  SELECT DISTINCT q_id, c_id, ${cosSql("q_emb", "c_emb")} AS cos
         |  FROM qa JOIN ca USING (cent_id) WHERE c_id <> q_id
         |), r AS (
         |  SELECT q_id, c_id, cos,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS INT) AS rank
         |  FROM p
         |)
         |SELECT q_id, c_id, rank, cos FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },
    "embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        |), d AS (
        |  SELECT vec_id,
        |         unnest(generate_series(0, len(emb) - 1)) AS dim,
        |         unnest(emb) AS v
        |  FROM e
        |), st AS (
        |  SELECT dim, min(v) AS min_v, max(v) AS max_v FROM d GROUP BY 1
        |), q AS (
        |  SELECT d.dim, d.v, st.min_v, st.max_v,
        |         CASE WHEN st.max_v = st.min_v THEN 0
        |              ELSE least(255, CAST(floor((d.v - st.min_v) * 255.0
        |                                         / (st.max_v - st.min_v)) AS BIGINT))
        |         END AS code
        |  FROM d JOIN st USING (dim)
        |), r AS (
        |  SELECT dim, v, min_v, max_v, code,
        |         CAST(round(abs(v - (min_v + (CAST(code AS DOUBLE) + 0.5)
        |                                     * (max_v - min_v) / 255.0))
        |                    * 1000000000.0) AS BIGINT) AS err_nano
        |  FROM q
        |)
        |SELECT dim, min(min_v) AS min_v, max(max_v) AS max_v,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN code = 255 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_saturated,
        |       round(CAST(sum(err_nano) AS DOUBLE) / 1000000000.0
        |             / CAST(count(*) AS DOUBLE), 6) AS mean_abs_err
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_recall" -> {
      val bucket = (0 until Planes)
        .map(p =>
          s"CASE WHEN round(list_dot_product(emb, ${planeSqlLiteral(p)}), 6) > 0 " +
            s"THEN ${1L << p} ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), q AS (
         |  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 50 = 0
         |), p AS (
         |  SELECT q_id, e.vec_id AS c_id, ${cosSql("q_emb", "e.emb")} AS cos
         |  FROM q, e WHERE e.vec_id <> q.q_id
         |), r AS (
         |  SELECT q_id, c_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         |  FROM p
         |), bf AS (
         |  SELECT q_id, c_id FROM r WHERE rank <= 10
         |), b AS (
         |  SELECT vec_id, emb, $bucket AS bucket FROM e
         |), ql AS (
         |  SELECT vec_id AS q_id, emb AS q_emb, bucket FROM b WHERE vec_id % 50 = 0
         |), pl AS (
         |  SELECT q_id, c.vec_id AS c_id, ${cosSql("q_emb", "c.emb")} AS cos
         |  FROM ql JOIN b c ON ql.bucket = c.bucket AND c.vec_id <> ql.q_id
         |), rl AS (
         |  SELECT q_id, c_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         |  FROM pl
         |), lsh AS (
         |  SELECT q_id, c_id FROM rl WHERE rank <= 10
         |)
         |SELECT (SELECT CAST(count(DISTINCT q_id) AS BIGINT) FROM bf) AS n_queries,
         |       (SELECT CAST(count(*) AS BIGINT) FROM bf) AS n_exact,
         |       (SELECT CAST(count(*) AS BIGINT) FROM bf JOIN lsh USING (q_id, c_id))
         |         AS n_hits,
         |       round(CAST((SELECT count(*) FROM bf JOIN lsh USING (q_id, c_id)) AS DOUBLE)
         |             / CAST((SELECT count(*) FROM bf) AS DOUBLE), 6) AS recall""".stripMargin
    },
    "embed_kmeans" ->
      s"""$kmeansWithChain
         |SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_vecs,
         |       CAST(sum(CAST(dist AS BIGINT)) AS BIGINT) AS inertia
         |FROM aF GROUP BY 1 ORDER BY 1""".stripMargin,
    "ivf_recall" ->
      s"""$kmeansWithChain, qp AS (
         |  SELECT vec_id AS q_id, vi AS qi, vv AS qq FROM w WHERE vec_id % 50 = 0
         |), qd AS (
         |  SELECT q_id, qi, qq, c.cid,
         |         qq + list_dot_product(c.ci, c.ci)
         |           - 2 * list_dot_product(qi, c.ci) AS qd
         |  FROM qp CROSS JOIN c${KmIters - 1} c
         |), prx AS (
         |  SELECT q_id, qi, qq, cid FROM (
         |    SELECT qd.*, row_number() OVER (PARTITION BY q_id ORDER BY qd, cid) AS rn
         |    FROM qd) WHERE rn <= 4
         |), pairs AS (
         |  SELECT prx.q_id, a.vec_id AS c_id,
         |         CAST(prx.qq + w.vv - 2 * list_dot_product(prx.qi, w.vi) AS BIGINT) AS dist
         |  FROM prx
         |  JOIN aF a ON a.cid = prx.cid
         |  JOIN w ON w.vec_id = a.vec_id
         |  WHERE a.vec_id <> prx.q_id
         |), ivf AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT pairs.*, row_number() OVER (PARTITION BY q_id
         |      ORDER BY dist, c_id) AS rn
         |    FROM pairs) WHERE rn <= 10
         |), dx AS (
         |  SELECT qp.q_id, w.vec_id AS c_id,
         |         CAST(qp.qq + w.vv - 2 * list_dot_product(qp.qi, w.vi) AS BIGINT) AS dist
         |  FROM qp, w WHERE w.vec_id <> qp.q_id
         |), bf AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT dx.*, row_number() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS rn
         |    FROM dx) WHERE rn <= 10
         |), st AS (
         |  SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries,
         |         CAST(count(*) AS BIGINT) AS n_exact
         |  FROM bf
         |), h AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_hits
         |  FROM bf JOIN ivf USING (q_id, c_id)
         |)
         |SELECT n_queries, n_exact, n_hits,
         |       round(CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) AS recall
         |FROM st CROSS JOIN h""".stripMargin,
    // aF IS the trained-IVF corpus assignment (same argmin, same
    // tie-break); c{iters-1} is the trained codebook the probes rank
    "knn_ivf_trained" ->
      s"""$kmeansWithChain, qp AS (
         |  SELECT vec_id AS q_id, vi AS qi, vv AS qq FROM w WHERE vec_id % 50 = 0
         |), qd AS (
         |  SELECT q_id, qi, qq, c.cid,
         |         qq + list_dot_product(c.ci, c.ci)
         |           - 2 * list_dot_product(qi, c.ci) AS qd
         |  FROM qp CROSS JOIN c${KmIters - 1} c
         |), pr AS (
         |  SELECT q_id, qi, qq, cid FROM (
         |    SELECT qd.*, row_number() OVER (PARTITION BY q_id ORDER BY qd, cid) AS rn
         |    FROM qd) WHERE rn <= 4
         |), pairs AS (
         |  SELECT pr.q_id, a.vec_id AS c_id,
         |         CAST(pr.qq + w.vv - 2 * list_dot_product(pr.qi, w.vi) AS BIGINT) AS dist
         |  FROM pr
         |  JOIN aF a ON a.cid = pr.cid
         |  JOIN w ON w.vec_id = a.vec_id
         |  WHERE a.vec_id <> pr.q_id
         |)
         |SELECT q_id, c_id, rank, dist FROM (
         |  SELECT pairs.*,
         |         CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY dist, c_id) AS INT) AS rank
         |  FROM pairs) WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,
    "embed_prototypes" ->
      s"""$kmeansWithChain, r AS (
         |  SELECT vec_id, cid, dist,
         |         row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rk,
         |         CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n_vecs
         |  FROM aF
         |), kk AS (
         |  SELECT r.*, greatest(CAST(1 AS BIGINT), (n_vecs * 3) // 4) AS n_keep FROM r
         |)
         |SELECT cid AS cluster_id, CAST(max(n_vecs) AS BIGINT) AS n_vecs,
         |       CAST(max(n_keep) AS BIGINT) AS n_keep,
         |       CAST(sum(CASE WHEN rk <= n_keep THEN CAST(dist AS BIGINT) ELSE 0 END)
         |            AS BIGINT) AS kept_dist,
         |       CAST(sum(CASE WHEN rk > n_keep THEN CAST(dist AS BIGINT) ELSE 0 END)
         |            AS BIGINT) AS pruned_dist
         |FROM kk GROUP BY 1 ORDER BY 1""".stripMargin,
    "cluster_ari" ->
      s"""$kmeansWithChain, lab AS (
         |  SELECT a.cid, e.label FROM aF a JOIN embeddings e ON a.vec_id = e.vec_id
         |), cc AS (
         |  SELECT cid, label, CAST(count(*) AS BIGINT) AS n_ab FROM lab GROUP BY 1, 2
         |), tot AS (
         |  SELECT CAST(sum(n_ab) AS BIGINT) AS n,
         |         CAST(count(DISTINCT cid) AS BIGINT) AS ka,
         |         CAST(count(DISTINCT label) AS BIGINT) AS kb,
         |         sum(CAST(n_ab AS HUGEINT) * (n_ab - 1)) AS x
         |  FROM cc
         |), maA AS (
         |  SELECT sum(CAST(n_a AS HUGEINT) * (n_a - 1)) AS aa
         |  FROM (SELECT CAST(sum(n_ab) AS BIGINT) AS n_a FROM cc GROUP BY cid)
         |), mbB AS (
         |  SELECT sum(CAST(n_b AS HUGEINT) * (n_b - 1)) AS bb
         |  FROM (SELECT CAST(sum(n_ab) AS BIGINT) AS n_b FROM cc GROUP BY label)
         |), f AS (
         |  SELECT n, ka, kb, x, aa, bb,
         |         CAST(n AS HUGEINT) * (n - 1) AS n2
         |  FROM tot CROSS JOIN maA CROSS JOIN mbB
         |)
         |SELECT n, ka AS n_parts_a, kb AS n_parts_b,
         |       CASE WHEN n2 * (aa + bb) - 2 * aa * bb <> 0 THEN
         |         round(2.0 * CAST(x * n2 - aa * bb AS DOUBLE)
         |               / CAST(n2 * (aa + bb) - 2 * aa * bb AS DOUBLE), 6) END AS ari
         |FROM f""".stripMargin,
    "cluster_silhouette" ->
      s"""$kmeansWithChain, alt AS (
         |  SELECT d.vec_id, min(d.dist) AS b
         |  FROM dF d JOIN aF ON d.vec_id = aF.vec_id AND d.cid <> aF.cid
         |  GROUP BY 1
         |), sv AS (
         |  SELECT aF.cid,
         |         CAST(round(CASE WHEN greatest(aF.dist, alt.b) > 0
         |                    THEN (alt.b - aF.dist) / greatest(aF.dist, alt.b)
         |                    ELSE 0 END * 1e9) AS BIGINT) AS s_nano
         |  FROM aF JOIN alt ON aF.vec_id = alt.vec_id
         |)
         |SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_vecs,
         |       round(CAST(sum(s_nano) AS DOUBLE) / count(*) / 1e9, 6)
         |         AS mean_silhouette
         |FROM sv GROUP BY 1 ORDER BY 1""".stripMargin,
    "cluster_nmi" ->
      s"""$kmeansWithChain, lab AS (
         |  SELECT a.cid, e.label FROM aF a JOIN embeddings e ON a.vec_id = e.vec_id
         |), cc AS (
         |  SELECT cid, label, CAST(count(*) AS BIGINT) AS n_ab FROM lab GROUP BY 1, 2
         |), wn AS (
         |  SELECT n_ab,
         |         CAST(sum(n_ab) OVER (PARTITION BY cid) AS BIGINT) AS n_a,
         |         CAST(sum(n_ab) OVER (PARTITION BY label) AS BIGINT) AS n_b,
         |         CAST(sum(n_ab) OVER () AS BIGINT) AS n
         |  FROM cc
         |), i AS (
         |  SELECT CAST(max(n) AS BIGINT) AS n,
         |         CAST(sum(n_ab * CAST(round(ln(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
         |                           / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
         |                        * 1e9) AS BIGINT)) AS BIGINT) AS mi_nano
         |  FROM wn
         |), ha AS (
         |  SELECT CAST(sum(nm * CAST(round(ln(CAST(nt AS DOUBLE) / CAST(nm AS DOUBLE))
         |                        * 1e9) AS BIGINT)) AS BIGINT) AS ha_nano
         |  FROM (SELECT CAST(sum(n_ab) AS BIGINT) AS nm,
         |               CAST(sum(sum(n_ab)) OVER () AS BIGINT) AS nt
         |        FROM cc GROUP BY cid)
         |), hb AS (
         |  SELECT CAST(sum(nm * CAST(round(ln(CAST(nt AS DOUBLE) / CAST(nm AS DOUBLE))
         |                        * 1e9) AS BIGINT)) AS BIGINT) AS hb_nano
         |  FROM (SELECT CAST(sum(n_ab) AS BIGINT) AS nm,
         |               CAST(sum(sum(n_ab)) OVER () AS BIGINT) AS nt
         |        FROM cc GROUP BY label)
         |)
         |SELECT n,
         |       round(CAST(ha_nano AS DOUBLE) / CAST(n AS DOUBLE) / 1e9, 6) AS h_a,
         |       round(CAST(hb_nano AS DOUBLE) / CAST(n AS DOUBLE) / 1e9, 6) AS h_b,
         |       round(CAST(mi_nano AS DOUBLE) / CAST(n AS DOUBLE) / 1e9, 6) AS mi,
         |       CASE WHEN ha_nano > 0 AND hb_nano > 0 THEN
         |         round(CAST(mi_nano AS DOUBLE)
         |               / sqrt(CAST(ha_nano AS DOUBLE) * CAST(hb_nano AS DOUBLE)), 6)
         |       END AS nmi
         |FROM i CROSS JOIN ha CROSS JOIN hb""".stripMargin,
    "dedup_semantic" ->
      s"""$kmeansWithChain, e2 AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), j AS (
         |  SELECT a.vec_id, a.cid, e2.emb FROM aF a JOIN e2 USING (vec_id)
         |), pr AS (
         |  SELECT x.cid, x.vec_id AS a_id, y.vec_id AS b_id,
         |         ${cosSql("x.emb", "y.emb")} AS cos
         |  FROM j x JOIN j y ON x.cid = y.cid AND x.vec_id < y.vec_id
         |), sel AS (
         |  SELECT cid, a_id, b_id FROM pr WHERE cos >= 0.4
         |), np AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS n_pairs FROM sel GROUP BY 1
         |), nd AS (
         |  SELECT cid, CAST(count(DISTINCT b_id) AS BIGINT) AS n_dropped
         |  FROM sel GROUP BY 1
         |), nv AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs FROM aF GROUP BY 1
         |)
         |SELECT nv.cid AS cluster_id, nv.n_vecs,
         |       CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
         |       CAST(coalesce(nd.n_dropped, 0) AS BIGINT) AS n_dropped
         |FROM nv LEFT JOIN np USING (cid) LEFT JOIN nd USING (cid)
         |ORDER BY 1""".stripMargin)

  /** Shared oracle CTE chain for the Lloyd fit: unrolled iterations in
    * exact integer micro-space — every value is an integer in IEEE double,
    * so sums/distances are exact in any order, bit-identical to the Spark
    * loop (KMeansOps docs). Ends at `aF(vec_id, cid, dist)`, the final
    * assignment; consumers append their own CTEs/SELECT.
    */
  private lazy val kmeansWithChain: String = {
    val seedHash = PortableHash.hash60Sql("'km:' || CAST(vec_id AS VARCHAR)")
    def iterCtes(i: Int): String = {
      val prev = s"c${i - 1}"
      s"""d$i AS (
         |  SELECT w.vec_id, c.cid,
         |         w.vv + list_dot_product(c.ci, c.ci)
         |           - 2 * list_dot_product(w.vi, c.ci) AS dist
         |  FROM w CROSS JOIN $prev c
         |), a$i AS (
         |  SELECT vec_id, cid, dist FROM (
         |    SELECT d$i.*, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d$i) WHERE rn = 1
         |), m$i AS (
         |  SELECT a.cid, g.i AS pos,
         |         CAST(CAST(trunc(sum(w.vi[g.i]) / count(*)) AS BIGINT) AS DOUBLE) AS comp
         |  FROM a$i a JOIN w ON a.vec_id = w.vec_id
         |  CROSS JOIN generate_series(1, $Dim) AS g(i)
         |  GROUP BY 1, 2
         |), c$i AS (
         |  SELECT cid, list(comp ORDER BY pos) AS ci FROM m$i GROUP BY cid
         |)""".stripMargin
    }
    s"""WITH v AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS vi
       |  FROM embeddings
       |), w AS (
       |  SELECT vec_id, vi, list_dot_product(vi, vi) AS vv FROM v
       |), seed AS (
       |  SELECT vi, row_number() OVER (ORDER BY $seedHash, vec_id) AS rn FROM v
       |), c0 AS (
       |  SELECT CAST(rn - 1 AS INT) AS cid, vi AS ci FROM seed WHERE rn <= $KmK
       |),${(1 until KmIters).map(iterCtes).mkString(", ")}, dF AS (
       |  SELECT w.vec_id, c.cid,
       |         w.vv + list_dot_product(c.ci, c.ci)
       |           - 2 * list_dot_product(w.vi, c.ci) AS dist
       |  FROM w CROSS JOIN c${KmIters - 1} c
       |), aF AS (
       |  SELECT vec_id, cid, dist FROM (
       |    SELECT dF.*, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM dF) WHERE rn = 1
       |)""".stripMargin
  }
}
