package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.BinMethod
import graft.operators.{HistogramOps, PercentileOps}

/** Scale-up stress: replicate sf0.1 lineitem 20× (~12M rows) into a local
  * parquet, then time the full two-pass histogram + deciles pipeline on it.
  * Prints rows/s so scale-up projections (would this survive 100×?) rest on
  * a measured number. Usage: runMain graft.tools.ScaleStress [factor]
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 20
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

    val path = s"target/stress/values_x$factor.parquet"
    if (!new java.io.File(path).exists()) {
      spark.read
        .parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(col("l_quantity"), col("l_extendedprice"))
        .crossJoin(spark.range(factor.toLong))
        .drop("id")
        .repartition(32)
        .write
        .mode("overwrite")
        .parquet(path)
    }
    val df = spark.read.parquet(path)
    val n = df.count()
    for (i <- 0 until 3) {
      val t0 = System.nanoTime()
      val deciles = PercentileOps
        .deciles(HistogramOps.computeHistogram(df, "l_quantity", BinMethod.Linear))
        .collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(
        f"RUN$i rows=$n deciles=${deciles.length} time=$dt%.2f s throughput=${n / dt / 1e6}%.1f M rows/s")
    }
    spark.stop()
  }
}
