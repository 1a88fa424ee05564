package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, DedupOps}

/** Scale-up stress for the round-7 lmBuckets shape: replicate sf0.1
  * documents N× with doc_id salting (replicas are distinct docs, so the
  * per-doc score relation — the relation the old global `ntile(3)` window
  * sorted — grows with the data) and time the histogram-cutpoint
  * implementation against an inline ntile twin at 1×/4×/16×.
  *
  * What the comparison isolates: both variants pay the same token
  * explode + vocab join to score docs; the difference is purely
  * bucket assignment — a ≤ 4096-bin histogram + boundary-bin rank +
  * broadcast compare (new) vs one unpartitioned window sort of every doc
  * on a single task (old). The old shape's cost term grows with corpus
  * size on ONE task; the new shape's per-task work stays flat.
  * Usage: runMain graft.tools.LmBucketsStress [maxFactor]
  */
object LmBucketsStress {
  def main(args: Array[String]): Unit = {
    val maxFactor = if (args.nonEmpty) args(0).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def t(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // the old implementation, kept verbatim as the comparison twin
    def ntileTwin(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.operators.TextOps
        .unigramNll(docs)
        .withColumn(
          "bucket",
          ntile(3).over(Window.orderBy(col("avg_nll"), col("doc_id"))))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(round(col("avg_nll") * lit(1e9)).cast("long")).as("sum_nll_nano"))

    var factor = 1
    while (factor <= maxFactor) {
      println(s"factor $factor:")
      val rep = spark.range(factor.toLong).select(col("id").as("copy"))
      val docs = spark.read
        .parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id"), col("text"))
        .crossJoin(rep)
        .select(
          (col("doc_id") * lit(maxFactor.toLong + 1) + col("copy")).as("doc_id"),
          col("text"))
      t("lm_buckets (hist cutpoints)")(CurationOps.lmBuckets(docs).count())
      DedupOps.releaseAllCaches()
      t("lm_buckets (ntile twin)    ")(ntileTwin(docs).count())
      DedupOps.releaseAllCaches()
      factor *= 4
    }
    spark.stop()
  }
}
