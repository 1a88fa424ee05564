package graft.sources.raster

/** Per-tile pixel-stream dispatch for the raster source's readers.
  *
  * Real decode ([[GeoTiff.PixelCursor]]) for every URI the cluster can
  * actually open through the Hadoop filesystem (file://, hdfs://, bare
  * paths); the deterministic stub stream ONLY for network object-store
  * schemes that are unreachable in this offline environment (the
  * reference's own fixtures are `s3://gfw-data/...` tile lists — their
  * scan planning is exercised for real, their bytes cannot be). The
  * dispatch is by SCHEME, not by open-failure: a local file that fails to
  * parse must fail loudly, never silently fall back to synthetic pixels.
  *
  * For real files the partition's `pixels` option is ignored — the TIFF's
  * own dimensions rule.
  */
object RasterDecode {

  trait Cursor extends AutoCloseable {
    def next(): Boolean
    def value(): Double
    override def close(): Unit = ()
  }

  /** Offline-unreachable schemes served by the stub stream. */
  val StubSchemes: Set[String] = Set("s3", "s3a", "s3n", "gs", "http", "https")

  def isStubUri(tileUri: String): Boolean =
    (try Option(new java.net.URI(tileUri).getScheme)
    catch { case _: java.net.URISyntaxException => None })
      .exists(s => StubSchemes.contains(s.toLowerCase))

  def open(tileUri: String, stubPixels: Long, overview: Int = 0): Cursor =
    if (isStubUri(tileUri)) stub(tileUri, stubPixels)
    else {
      val in = new GeoTiff.HadoopSeekable(tileUri)
      val cur =
        try new GeoTiff.PixelCursor(in, overview)
        catch { case e: Throwable => in.close(); throw e }
      new Cursor {
        def next(): Boolean = cur.next()
        def value(): Double = cur.value()
        override def close(): Unit = in.close()
      }
    }

  def stub(tileUri: String, pixels: Long): Cursor = {
    val s = new RasterAggScans.PixelStream(tileUri, pixels)
    new Cursor {
      def next(): Boolean = s.next()
      def value(): Double = s.value()
    }
  }
}
