package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/** Scale-up stress for the text-analytics operators added in round 8:
  * replicate the sf0.1 documents corpus N× (doc_ids remapped to stay
  * unique, texts unchanged) and time pmi_bigrams / zipf_slope /
  * source_ttr / split_leakage warm at each factor. Replication leaves PMI
  * values and the Zipf slope INVARIANT (every count scales by exactly N,
  * which cancels in the ratios) — printed alongside the timings so the
  * runs double as a correctness check at scale.
  * Usage: runMain graft.tools.TextStress [factors...] (default 1 8 64)
  */
object TextStress {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 8, 64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

    factors.foreach { factor =>
      val path = s"target/stress/docs_x$factor.parquet"
      if (!new java.io.File(path).exists()) {
        spark.read
          .parquet("/root/testdata/sf0.1/documents.parquet")
          .crossJoin(spark.range(factor.toLong).select(col("id").as("rep")))
          .select(
            (col("doc_id") * factor + col("rep")).as("doc_id"),
            col("text"), col("lang"), col("source"), col("n_chars"))
          .repartition(32)
          .write.mode("overwrite").parquet(path)
      }
      val docs = spark.read.parquet(path)
      val nDocs = docs.count()
      def run(): Seq[(String, Double)] = {
        val r = Seq(
          "pmi_bigrams" -> time(force(TextOps.pmiBigrams(docs)))._1,
          "zipf_slope" -> time(force(TextOps.zipfSlope(docs)))._1,
          "source_ttr" -> time(force(TextOps.sourceLexicalDiversity(docs)))._1,
          "split_leakage" -> time(force(TextOps.splitLeakage(docs)))._1)
        DedupOps.releaseShingleCaches()
        r
      }
      run() // warm-up
      val warm = run()
      val top = TextOps.pmiBigrams(docs).select("w1", "w2", "pmi").head()
      val slope = TextOps.zipfSlope(docs).filter(col("lang") === "en")
        .select("slope").head().getDouble(0)
      DedupOps.releaseAllCaches()
      println(
        f"factor=$factor%-3d docs=$nDocs%-8d " +
          warm.map { case (n, t) => f"$n=$t%.2fs" }.mkString(" ") +
          f" | invariants: top_pmi=(${top.getString(0)},${top.getString(1)})=${top.getDouble(2)}%.6f en_slope=$slope%.6f")
    }
    spark.stop()
  }
}
