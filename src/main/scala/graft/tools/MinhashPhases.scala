package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Phase-level timing of the MinHash-LSH pipeline: shingle cache fill,
  * wide signature aggregation, banding, candidate join, estimate join.
  * Usage: runMain graft.tools.MinhashPhases [sfDir]
  */
object MinhashPhases {
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
    DedupOps.minhashLsh(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"),
      3, 16, 4, 0.4).count()
    DedupOps.releaseAllCaches()

    (0 until 2).foreach { rep =>
      println(s"rep $rep:")
      val toks = docs
        .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("tk"))
        .persist()
      val sh = toks
        .select(col("doc_id"), DedupOps.shingles(col("tk"), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))
        .select(col("doc_id"), col("nsh"), graft.functions.PortableHash.hash60(col("s")).as("h"))
        .persist()
      t("shingle fill  ")(sh.count())
      val numPerm = 16
      val rowsPerBand = 4
      val consts = DedupOps.permConstants(numPerm)
      val aggs = consts.toIndexedSeq.zipWithIndex.map { case (c, j) =>
        min(col("h").bitwiseXOR(lit(c))).as(s"mh$j")
      }
      val mh = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).persist()
      t("signatures    ")(mh.count())
      val bandStructs = (0 until numPerm / rowsPerBand).map { b =>
        val key = concat_ws(
          ",",
          (b * rowsPerBand until (b + 1) * rowsPerBand).map(j =>
            concat_ws(":", lit(j), col(s"mh$j"))): _*)
        struct(lit(b).as("band"), key.as("band_key"))
      }
      val bands = mh
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
      val cand = bands
        .toDF("a_id", "band", "band_key")
        .join(bands.toDF("b_id", "band", "band_key"), Seq("band", "band_key"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        .distinct()
        .persist()
      t("candidates    ")(cand.count())
      val sigA = mh.select(col("doc_id").as("a_id") +:
        (0 until numPerm).map(j => col(s"mh$j").as(s"amh$j")): _*)
      val sigB = mh.select(col("doc_id").as("b_id") +:
        (0 until numPerm).map(j => col(s"mh$j").as(s"bmh$j")): _*)
      val matches = (0 until numPerm)
        .map(j => when(col(s"amh$j") === col(s"bmh$j"), 1).otherwise(0))
        .reduce(_ + _)
      t("estimate join ")(
        broadcast(broadcast(cand).join(sigA, Seq("a_id")))
          .join(sigB, Seq("b_id"))
          .select(col("a_id"), col("b_id"),
            round(matches.cast("double") / lit(numPerm.toDouble), 6).as("est_jaccard"))
          .filter(col("est_jaccard") >= lit(0.4))
          .count())
      Seq(toks, sh, mh, cand).foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
