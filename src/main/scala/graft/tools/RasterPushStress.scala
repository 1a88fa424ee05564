package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.BinMethod
import graft.{HistogramConfig, HistogramRunner}

/** Raw-pixel vs source-pushed two-pass pipeline on a synthetic tile list.
  * Usage: runMain graft.tools.RasterPushStress [tiles] [pixelsPerTile]
  */
object RasterPushStress {
  def main(args: Array[String]): Unit = {
    val nTiles = if (args.length > 0) args(0).toInt else 32
    val pixels = if (args.length > 1) args(1).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val list = java.nio.file.Files.createTempFile("push_tiles", ".txt")
    java.nio.file.Files.writeString(
      list,
      (0 until nTiles).map(i => s"s3://stress/tile_$i.tif").mkString("\n"))
    val cfg = HistogramConfig("value", BinMethod.Linear)

    def rawOnce(): Long = {
      val src = spark.read
        .format("graft.sources.raster.RasterSource")
        .option("tileListPath", list.toString)
        .option("pixelsPerTile", pixels.toString)
        .load()
      HistogramRunner.run(src, cfg).count()
    }
    def pushedOnce(): Long =
      HistogramRunner.runPushed(spark, list.toString, pixels, cfg).count()

    for (i <- 0 until 2) {
      var t0 = System.nanoTime()
      val r = rawOnce()
      val rawS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val p = pushedOnce()
      val pushS = (System.nanoTime() - t0) / 1e9
      println(
        f"RUN$i tiles=$nTiles px=$pixels raw=$rawS%.2f s pushed=$pushS%.2f s bins(raw=$r pushed=$p)")
    }
    spark.stop()
  }
}
