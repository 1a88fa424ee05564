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
  def t(l: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
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
      val c = SimilarityOps.corpus(emb)
      val q = c.filter(col("vec_id") < 2000 && col("vec_id") % 50 === 0) // fixed |Q|
      val nlist = math.max(16, math.sqrt(emb.count().toDouble).toInt)
      t(s"knn_ivf nlist=$nlist")(SimilarityOps.knnIvf(q, c, 10, nlist, math.max(4, nlist / 16)).count())
      DedupOps.releaseAllCaches()
      // the Θ(n²)-by-design exact all-pairs path: the interesting datapoint
      // is the auto-sizer ESCALATING the block count with the corpus (B=1
      // collapses to the cheap plan at 2k; the blocked equi-join must
      // engage at 4×+) while wall time tracks n²/cores, not replication
      val autoB = SimilarityOps.autoBlocks(SimilarityOps.corpus(emb))
      t(s"nearDupPairs cos>=0.4 autoB=$autoB")(SimilarityOps.nearDupPairs(emb, 0.4).count())
      DedupOps.releaseAllCaches()
      // the SemDeDup scale path: k grows with the corpus (target ~n/256
      // per cluster) so the intra-cluster quadratic kernel stays bounded —
      // wall time should track n·(n/k), i.e. ~linear when k scales, vs the
      // n² of the exact path above
      val kSem = math.max(8, (emb.count() / 256).toInt)
      t(s"semanticDedup k=$kSem")(
        SimilarityOps.semanticDedup(emb, k = kSem, iters = 2, minCos = 0.4).count())
      DedupOps.releaseAllCaches()
    }
    spark.stop()
  }
}
