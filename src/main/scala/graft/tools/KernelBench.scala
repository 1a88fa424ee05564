package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.SimilarityOps
import graft.sources.Tables

/** Kernel micro-benchmarks: native codegen CosineSimilarity vs the
  * interpreted higher-order-function formulation, on the all-pairs
  * embedding workload. Usage: runMain graft.tools.KernelBench [sfDir]
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.tune(spark)

    val e = SimilarityOps.corpus(Tables.embeddings(spark, sfDir)).cache()
    e.count()
    val a = e.toDF("a_id", "a_emb")
    val b = e.toDF("b_id", "b_emb")
    val pairs = a.crossJoin(b).filter(col("a_id") < col("b_id"))

    def time(label: String)(thunk: => Double): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val s = thunk
        println(f"$label run$i: sum=$s%.4f ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // the agg head() fully evaluates every cosine — nothing else is timed
    time("native ") {
      pairs
        .select(GraftFunctions.cosine(col("a_emb"), col("b_emb")).as("c"))
        .agg(sum("c"))
        .head()
        .getDouble(0)
    }
    time("hof    ") {
      pairs
        .select(GraftFunctions.cosineHof(col("a_emb"), col("b_emb")).as("c"))
        .agg(sum("c"))
        .head()
        .getDouble(0)
    }
    spark.stop()
  }
}
