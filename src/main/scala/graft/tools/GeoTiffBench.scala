package graft.tools

import graft.sources.raster.GeoTiff

/** Single-core decode throughput of the pure-JVM GeoTIFF reader, per
  * compression, on a synthetic 2048×2048 band (ImageIO-encoded uint8;
  * builder-encoded float32 deflate). The raster scan parallelizes
  * partition-per-tile, so per-core decode rate × cores is the scan bound.
  * Usage: runMain graft.tools.GeoTiffBench
  */
object GeoTiffBench {
  def main(args: Array[String]): Unit = {
    val w = 2048
    val h = 2048
    val rnd = new scala.util.Random(1)
    val pix = Array.fill(w * h)(rnd.nextInt(256))

    def imageIo(compression: String, tiled: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setPixels(0, 0, w, h, pix)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionType(compression)
      if (tiled) { // NOTE: the JDK writer corrupts ZLib+tiled output (its own
        // reader cannot read it back) — only LZW benches tiled
        param.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setTiling(256, 256, 0, 0)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.flush(); writer.dispose()
      bos.toByteArray
    }

    def time(label: String, bytes: Array[Byte]): Unit = {
      // warm-up + 3 timed reps, report best
      var best = Double.MaxValue
      var n = 0L
      for (rep <- 0 until 4) {
        val t0 = System.nanoTime()
        val cur = new GeoTiff.PixelCursor(new GeoTiff.ByteArraySeekable(bytes))
        n = 0L
        var s = 0.0
        while (cur.next()) { s += cur.value(); n += 1 }
        val dt = (System.nanoTime() - t0) / 1e9
        if (rep > 0) best = math.min(best, dt)
      }
      println(f"$label: ${n / best / 1e6}%.1f Mpx/s (${bytes.length / 1024} KiB file, $n px)")
    }

    time("uint8 LZW tiled      ", imageIo("LZW", tiled = true))
    time("uint8 Deflate strips ", imageIo("ZLib", tiled = false))
    time("uint8 PackBits strips", imageIo("PackBits", tiled = false))

    // end-to-end: the reference's two-pass pipeline over a REAL tile list
    // through the DSv2 pushed scan (stats + hist modes decode in-reader),
    // partition-per-tile across local[32]
    val nTiles = 32
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-tiles")
    dir.toFile.deleteOnExit()
    val tileBytes = imageIo("LZW", tiled = true)
    val uris = (0 until nTiles).map { i =>
      val f = dir.resolve(f"tile_$i%02d.tif")
      java.nio.file.Files.write(f, tileBytes)
      "file://" + f.toAbsolutePath
    }
    val listFile = dir.resolve("tiles.txt")
    java.nio.file.Files.write(listFile, uris.mkString("\n").getBytes("UTF-8"))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = graft.HistogramConfig(valueCol = "value")
    var best = Double.MaxValue
    for (rep <- 0 until 3) {
      val t0 = System.nanoTime()
      val n = graft.HistogramRunner
        .runPushed(spark, listFile.toString, 0L, cfg)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9
      if (rep > 0) best = math.min(best, dt)
      if (rep == 0) println(s"  pipeline bins: $n")
    }
    val totalPx = nTiles.toLong * w * h
    println(f"2-pass pushed pipeline, $nTiles real LZW tiles: ${totalPx * 2 / best / 1e6}%.0f Mpx/s aggregate (both passes), $best%.2f s wall")
    spark.stop()
  }
}
