package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/** Scale-up stress for the dedup/curation pipeline: replicate the sf0.1
  * documents corpus 1×/2×/4× with every copy's tokens SALTED by its copy
  * id (so copies share no shingles — replication grows the corpus without
  * fabricating cross-copy near-dups, which would inflate the true output
  * quadratically and measure the data, not the plan). A sub-quadratic
  * pipeline should scale ~linearly in wall time here; the round-1 hazard
  * (hot-shingle blocking join) scaled with Σ df² instead.
  *
  * Usage: runMain graft.tools.DedupScaleStress
  */
object DedupScaleStress {
  def t(l: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
  }

  def salted(spark: SparkSession, factor: Int): DataFrame = {
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val copies = (0 until factor).map { c =>
      base.select(
        (col("doc_id") * factor + c).as("doc_id"),
        concat_ws(
          " ",
          transform(TextOps.tokens(col("text")), w => concat(lit(s"c$c"), w))).as("text"),
        col("lang"),
        col("source"),
        col("n_chars"))
    }
    copies.reduce(_.union(_))
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
    // warm-up: codegen + JIT on the small corpus
    DedupOps.jaccardPairs(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"), 3, 0.5).count()
    DedupOps.releaseAllCaches()
    for (factor <- Seq(1, 2, 4)) {
      val path = s"target/stress/docs_x$factor.parquet"
      if (!new java.io.File(path).exists()) salted(spark, factor).write.parquet(path)
      val docs = spark.read.parquet(path)
      println(s"factor $factor (${docs.count()} docs):")
      t("jaccard pairs")(DedupOps.jaccardPairs(docs, 3, 0.5).count())
      DedupOps.releaseAllCaches()
      t("decontaminate")(DedupOps.decontaminate(docs).count())
      DedupOps.releaseAllCaches()
      t("minhash lsh")(DedupOps.minhashLsh(docs, 3, 16, 4, 0.4).count())
      DedupOps.releaseAllCaches()
      t("components ")(graft.operators.ClusterOps
        .nearDupClusters(docs, 3, 0.5).count())
      DedupOps.releaseAllCaches()
      t("pagerank   ")(graft.operators.ClusterOps
        .nearDupPagerank(docs, 3, 0.5).count())
      DedupOps.releaseAllCaches()
    }
    spark.stop()
  }
}
