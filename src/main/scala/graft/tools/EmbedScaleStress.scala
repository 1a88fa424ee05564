package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, KMeansOps, SimilarityOps}

/** Scale-up stress for the embedding operators: replicate sf0.1
  * embeddings 1×/4×/16× (2k → 32k vectors) with offset ids and time the
  * linear-cost paths — k-means (O(n·k·d) per iteration) and IVF knn with
  * a FIXED query set (per-query cost O(N·nprobe/nlist); nlist scales as
  * √N via the knnAuto sizing rule, so per-query work grows ~√N). The
  * quadratic exact paths (brute force, all-pairs) are intentionally
  * excluded — their cost model is output-bound by design.
  *
  * Usage: runMain graft.tools.EmbedScaleStress
  */
object EmbedScaleStress {
  def t(l: String)(f: => Long): Double = {
    val t0 = System.nanoTime()
    val n = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"  $l: $sec%.2f s ($n rows)")
    sec
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    val base = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
    // warm-up
    KMeansOps.fitSummary(graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001"), 8, 2).count()
    DedupOps.releaseAllCaches()
    // (factor, n, exact s, lsh s) per sweep point — the exact-vs-LSH
    // crossover evidence behind nearDupPairs' size route
    val crossover = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    val lshTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val fitCost = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    for (factor <- Seq(1, 4, 16)) {
      val path = s"target/stress/emb_x$factor.parquet"
      if (!new java.io.File(path).exists()) {
        (0 until factor)
          .map(c => base.select((col("vec_id") * factor + c).as("vec_id"), col("embedding"), col("label")))
          .reduce((a: DataFrame, b: DataFrame) => a.union(b))
          .write
          .parquet(path)
      }
      val emb = spark.read.parquet(path)
      println(s"factor $factor (${emb.count()} vectors):")
      t("kmeans k=8 x2 iters")(KMeansOps.fitSummary(emb, 8, 2).count())
      DedupOps.releaseAllCaches()
      // r12 verdict #1 evidence: codebook TRAINING cost, full fit vs the
      // sampled-fit route (bounded ~256·k training set). Full-fit cost is
      // O(n·k·d·iters) and grows with the factor; the sampled fit must
      // stay flat once the route fires — with k=32 the sample target is
      // 8192, so only factor 16 (32k > 8192) genuinely subsamples; at
      // factors 1/4 the corpus is under the target and the route
      // correctly refuses (recorded as a second full-fit time). The
      // production-scale point (512k vectors, DEFAULT ceiling) lives in
      // tools/FitCostPoint.
      val kFit = 32 // sample target 256·32 = 8192: the route fires at 32k
      val tFull = t(s"fitCentroids k=$kFit FULL fit (route disabled)")(
        KMeansOps.fitCentroids(emb, kFit, 2, maxFullFitVectors = Long.MaxValue).count())
      DedupOps.releaseAllCaches()
      val tSampled = t(s"fitCentroids k=$kFit forced-ceiling (sampled when n>256k)")(
        KMeansOps.fitCentroids(emb, kFit, 2, maxFullFitVectors = 100).count())
      DedupOps.releaseAllCaches()
      fitCost += ((factor, emb.count(), tFull, tSampled))
      val c = SimilarityOps.corpus(emb)
      val q = c.filter(col("vec_id") < 2000 && col("vec_id") % 50 === 0) // fixed |Q|
      val nlist = math.max(16, math.sqrt(emb.count().toDouble).toInt)
      t(s"knn_ivf nlist=$nlist")(SimilarityOps.knnIvf(q, c, 10, nlist, math.max(4, nlist / 16)).count())
      DedupOps.releaseAllCaches()
      // trained quantizer at the same nlist: the Lloyd fit is the extra
      // cost (O(n·nlist·d) per round), the search shape is identical —
      // probeEvery scales with the corpus so |Q| stays fixed at ~50
      val pe = math.max(1, (emb.count() / 50).toInt)
      t(s"knn_ivf_trained nlist=$nlist (fit incl.)")(
        SimilarityOps.knnIvfTrained(emb, 10, nlist, iters = 2,
          nprobe = math.max(4, nlist / 16), probeEvery = pe).count())
      DedupOps.releaseAllCaches()
      // r13 verdict #3 evidence: knnRerank's coarse stage, exact |Q|·N
      // cross join vs the routed IVF-probed shortlist (fit incl.) at the
      // same fixed |Q| — the cross join's cost grows linearly in N, the
      // routed coarse stage only by N·nprobe/nlist
      t(s"knn_rerank EXACT coarse (|Q|x${emb.count()} cross join)")(
        SimilarityOps.knnRerank(q, c, 10, rerank = 50).count())
      DedupOps.releaseAllCaches()
      t(s"knn_rerank ROUTED coarse (IVF nlist=$nlist shortlist)")(
        SimilarityOps.knnRerank(q, c, 10, rerank = 50, maxExactVectors = 100).count())
      DedupOps.releaseAllCaches()
      // the Θ(n²)-by-design exact all-pairs path: the interesting datapoint
      // is the auto-sizer ESCALATING the block count with the corpus (B=1
      // collapses to the cheap plan at 2k; the blocked equi-join must
      // engage at 4×+) while wall time tracks n²/cores, not replication
      val autoB = SimilarityOps.autoBlocks(SimilarityOps.corpus(emb))
      val routeHere = SimilarityOps.shouldRouteLsh(SimilarityOps.corpus(emb))
      println(s"  size-route decision at default threshold " +
        s"(${SimilarityOps.MaxExactVectors}): routeLsh=$routeHere")
      val tExact = t(s"nearDupPairs cos>=0.4 autoB=$autoB (exact kernel)")(
        SimilarityOps.nearDupPairs(emb, 0.4, blocks = autoB).count())
      DedupOps.releaseAllCaches()
      // the auto-route firing: a forced-low threshold must hand back the
      // session-memoized LSH relation, never the quadratic kernel
      val routed = SimilarityOps.nearDupPairs(emb, 0.4, maxExactVectors = 100)
      val directLsh = SimilarityOps.nearDupPairsLsh(emb, 0.4, 20, 6, 64)
      require(routed eq directLsh, "auto-route must land on the LSH relation")
      println("  auto-route (threshold=100): routed to nearDupPairsLsh — OK")
      DedupOps.releaseAllCaches()
      crossover += ((factor, emb.count(), tExact))
      // the SemDeDup scale path: k grows with the corpus (target ~n/256
      // per cluster) so the intra-cluster quadratic kernel stays bounded —
      // wall time should track n·(n/k), i.e. ~linear when k scales, vs the
      // n² of the exact path above
      val kSem = math.max(8, (emb.count() / 256).toInt)
      t(s"semanticDedup k=$kSem")(
        SimilarityOps.semanticDedup(emb, k = kSem, iters = 2, minCos = 0.4).count())
      DedupOps.releaseAllCaches()
      // the sub-quadratic LSH path at dedup_embedding_lsh's LOW-threshold
      // config: candidate volume vs n²/2. This synthetic corpus is the
      // UNFAVORABLE regime by construction (near-random 64-dim vectors,
      // threshold 0.4 barely above the background cosine tail), so the
      // prefilter retains ~28 % of pairs — the documented trade.
      val nv = emb.count()
      val allPairs = nv * (nv - 1) / 2
      val candN = SimilarityOps
        .lshCandidates(SimilarityOps.corpus(emb), bands = 20, planesPerBand = 6, dim = 64)
        .count()
      println(f"  lshCandidates b=20 r=6 (low-threshold regime): $candN%d of $allPairs%d " +
        f"all-pairs (${100.0 * candN / allPairs}%.1f%%)")
      lshTimes += t("nearDupPairsLsh cos>=0.4")(
        SimilarityOps.nearDupPairsLsh(emb, 0.4, bands = 20, planesPerBand = 6, dim = 64).count())
      DedupOps.releaseAllCaches()
      // the FAVORABLE regime the path defaults for — real near-dups
      // (perturbed copies, cos ≈ 1) against a sharper banding
      // (12 bands × 10 planes → background collision ~12·2⁻¹⁰ ≈ 1 %):
      // plant 1 % duplicates, search at the production threshold 0.9,
      // and report candidates ≪ n²/2 plus planted-dup recall
      val planted = emb
        .filter(pmod(col("vec_id"), lit(100)) === 0)
        .select(
          (col("vec_id") + lit(10000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding"),
          col("label"))
      val dupCorpus = emb.select(col("vec_id"), col("embedding"), col("label")).union(planted)
      val nd = dupCorpus.count()
      val candHi = SimilarityOps
        .lshCandidates(SimilarityOps.corpus(dupCorpus), bands = 12, planesPerBand = 10, dim = 64)
        .count()
      val nPlanted = planted.count()
      val found = SimilarityOps
        .nearDupPairsLsh(dupCorpus, 0.9, bands = 12, planesPerBand = 10, dim = 64)
        .filter(col("b_id") - col("a_id") === 10000000L)
        .count()
      println(f"  lshCandidates b=12 r=10 (near-dup regime): $candHi%d of " +
        f"${nd * (nd - 1) / 2}%d all-pairs (${100.0 * candHi / (nd * (nd - 1) / 2)}%.2f%%), " +
        f"planted-dup recall $found%d/$nPlanted%d")
      t("nearDupPairsLsh cos>=0.9 planted")(
        SimilarityOps.nearDupPairsLsh(dupCorpus, 0.9, bands = 12, planesPerBand = 10, dim = 64).count())
      DedupOps.releaseAllCaches()
    }
    println("\ncodebook training cost (k=32 x2 iters): full fit vs sampled-fit route")
    println("  factor |      n | full s | sampled s | full/sampled")
    fitCost.foreach { case (f, n, tf, ts) =>
      println(f"  $f%6d | $n%6d | $tf%6.2f | $ts%9.2f | ${tf / ts}%12.2fx")
    }
    println("\nexact-vs-LSH crossover (low-threshold regime, cos>=0.4):")
    println("  factor |      n | exact s | lsh s | exact/lsh")
    crossover.zip(lshTimes).foreach { case ((f, n, te), tl) =>
      println(f"  $f%6d | $n%6d | $te%7.2f | $tl%5.2f | ${te / tl}%9.2fx")
    }
    spark.stop()
  }
}
