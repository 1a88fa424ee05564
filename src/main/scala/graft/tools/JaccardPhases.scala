package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Phase-level timing of the Jaccard pair pipeline (the bench's slowest
  * query): shingle cache fill, prefix windows, candidate join, verify.
  * Usage: runMain graft.tools.JaccardPhases [sfDir]
  */
object JaccardPhases {
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
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    val docs = graft.sources.Tables.documents(spark, sfDir)

    def t(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // warm JIT on the small corpus first
    DedupOps.jaccardPairs(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"), 3, 0.5).count()
    DedupOps.releaseAllCaches()

    (0 until 2).foreach { rep =>
      println(s"rep $rep:")
      // phase 1+2: the full pipeline's own prefix relation, isolated by
      // reproducing its lineage (same expressions as jaccardPairs)
      val toks = docs
        .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("tk"))
        .persist()
      val sh = toks
        .select(col("doc_id"), DedupOps.shingles(col("tk"), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))
        .select(col("doc_id"), col("nsh"), graft.functions.PortableHash.hash60(col("s")).as("h"))
        .persist()
      t("shingle fill ")(sh.count())
      val wdf = Window.partitionBy(col("h"))
      val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      val prefix = sh
        .withColumn("df", count(lit(1)).over(wdf))
        .withColumn("rn", row_number().over(wdoc))
        .filter(col("rn") <= col("nsh") - ceil(lit(0.5) * col("nsh") - lit(1e-6)) + lit(1))
        .select(col("doc_id"), col("nsh"), col("h"), col("rn"))
        .persist()
      t("prefix windows")(prefix.count())
      val cand = prefix
        .toDF("a_id", "na", "h", "rn_a")
        .join(prefix.toDF("b_id", "nb", "h", "rn_b"), Seq("h"))
        .filter(col("a_id") < col("b_id"))
        .filter(
          least(col("na"), col("nb")).cast("double") >=
            (lit(0.5) - lit(1e-6)) * greatest(col("na"), col("nb")))
        .groupBy(col("a_id"), col("b_id"))
        .agg(
          count(lit(1)).as("cnt"),
          max(col("rn_a")).as("maxa"),
          max(col("rn_b")).as("maxb"),
          min(col("na")).as("cna"),
          min(col("nb")).as("cnb"))
        .filter(
          (col("cnt") + least(col("cna") - col("maxa"), col("cnb") - col("maxb")))
            .cast("double") >=
            lit(0.5) * (col("cna") + col("cnb")).cast("double") / lit(1.5) - lit(1e-6))
        .select(col("a_id"), col("b_id"))
        .persist()
      t("candidates   ")(cand.count())
      val a = sh.toDF("a_id", "na", "h")
      val b = sh.toDF("b_id", "nb", "h")
      val out = cand
        .hint("SHUFFLE_HASH")
        .join(a, Seq("a_id"))
        .join(b.hint("SHUFFLE_HASH"), Seq("b_id", "h"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("inter"), min(col("na")).as("na"), min(col("nb")).as("nb"))
        .withColumn(
          "jaccard",
          round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"), 6))
        .filter(col("jaccard") >= 0.5)
      t("verify       ")(out.count())
      Seq(toks, sh, prefix, cand).foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
