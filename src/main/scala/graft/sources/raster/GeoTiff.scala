package graft.sources.raster

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM GeoTIFF band-1 decoder — replaces the stub pixel
  * stream for tile URIs the cluster can actually open (GDAL/rasterio are
  * unavailable offline, and a histogram engine needs only the sample
  * values, not warping/CRS — so the TIFF container is decoded directly
  * from its public specification).
  *
  * Derived entirely from the published TIFF 6.0 specification plus the
  * BigTIFF and GDAL metadata conventions (all public). Supported, chosen
  * to cover what GDAL writes for the reference's cloud-optimized GeoTIFF
  * tiles (reference reads band 1 via rasterio — compute_histogram/
  * main.py:237-241):
  *
  *  - classic TIFF (magic 42) and BigTIFF (magic 43), either byte order;
  *  - stripped and tiled layouts (tile edge padding clipped on emit);
  *  - chunky (PlanarConfiguration=1, band 1 = sample 0) and planar (=2,
  *    band 1 = plane 0) interleave;
  *  - Compression: 1 none, 5 LZW (with the TIFF "early change"
  *    convention), 8/32946 Deflate, 32773 PackBits;
  *  - Predictor: 1 none, 2 horizontal differencing (8/16/32-bit), 3
  *    floating-point (byte-split) for float32/float64;
  *  - SampleFormat uint/int/float at 8/16/32/64 bits;
  *  - GDAL_NODATA (tag 42113): matching samples emit NaN, the engine's
  *    nodata convention (F1 filters NaN downstream, never the scan).
  *
  * Only the FIRST image directory is read — in a cloud-optimized GeoTIFF
  * the first IFD is the full-resolution image; overview IFDs are reduced
  * copies a histogram must not double-count.
  *
  * Scale shape: one compressed block (strip or tile) is materialized at a
  * time — a 40000×40000 float32 tile streams through ~tile-sized buffers,
  * never the whole band (unlike the reference's full-band ndarray).
  */
object GeoTiff {

  /** Random-access byte source (the TIFF structure is offset-based). */
  trait SeekableBytes extends AutoCloseable {
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit
    override def close(): Unit = ()
  }

  final class ByteArraySeekable(bytes: Array[Byte]) extends SeekableBytes {
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit =
      System.arraycopy(bytes, pos.toInt, dst, off, len)
  }

  /** Hadoop-filesystem source: any scheme the cluster knows (file://,
    * hdfs://, s3a:// where reachable). Opened per partition on the
    * executor; the default Hadoop configuration is overlaid with the
    * session's `spark.hadoop.*` entries (via the executor-side SparkEnv)
    * so filesystem credentials/endpoints configured on the session reach
    * the scan — a bare `new Configuration()` would drop them on a real
    * cluster.
    */
  final class HadoopSeekable(uri: String) extends SeekableBytes {
    private val path = new org.apache.hadoop.fs.Path(uri)
    private val conf = {
      val c = new org.apache.hadoop.conf.Configuration()
      Option(org.apache.spark.SparkEnv.get).foreach {
        _.conf.getAllWithPrefix("spark.hadoop.").foreach { case (k, v) => c.set(k, v) }
      }
      c
    }
    private val in = path.getFileSystem(conf).open(path)
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit =
      in.readFully(pos, dst, off, len)
    override def close(): Unit = in.close()
  }

  // TIFF field type byte widths (type codes from the TIFF 6.0 / BigTIFF
  // specs; RATIONALs appear only in tags this decoder ignores)
  private val TypeSize: Map[Int, Int] = Map(
    1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 6 -> 1, 7 -> 1, 8 -> 2,
    9 -> 4, 10 -> 8, 11 -> 4, 12 -> 8, 16 -> 8, 17 -> 8, 18 -> 8)

  final case class Layout(
      width: Int,
      height: Int,
      bitsPerSample: Int,
      sampleFormat: Int, // 1 uint, 2 int, 3 float
      samplesPerPixel: Int,
      planar: Int, // 1 chunky, 2 separate planes
      compression: Int,
      predictor: Int,
      tiled: Boolean,
      blockWidth: Int, // strips: width
      blockHeight: Int, // strips: RowsPerStrip
      offsets: Array[Long], // plane-0 blocks only
      byteCounts: Array[Long],
      nodata: Option[Double])

  /** Parse the header + the `ifdIndex`-th image directory into a
    * normalized block layout. Index 0 is the full-resolution image; in a
    * cloud-optimized GeoTIFF indices 1.. are the overview pyramid
    * (2×/4×/... downsamples) — the fast-approximate scan path: a
    * histogram of overview n touches 4^-n of the pixels.
    */
  def readLayout(in: SeekableBytes, ifdIndex: Int = 0): Layout = {
    val hdr = new Array[Byte](16)
    in.readFully(0, hdr, 0, 16)
    val le = (hdr(0), hdr(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _          => throw new IllegalArgumentException("not a TIFF: bad byte-order mark")
    }
    def u16(b: Array[Byte], o: Int): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(b: Array[Byte], o: Int): Long = {
      val (b0, b1, b2, b3) =
        (b(o) & 0xffL, b(o + 1) & 0xffL, b(o + 2) & 0xffL, b(o + 3) & 0xffL)
      if (le) b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
      else (b0 << 24) | (b1 << 16) | (b2 << 8) | b3
    }
    def u64(b: Array[Byte], o: Int): Long =
      if (le) java.lang.Long.reverseBytes(beLong(b, o)) else beLong(b, o)
    def beLong(b: Array[Byte], o: Int): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }

    val magic = u16(hdr, 2)
    val big = magic match {
      case 42 => false
      case 43 =>
        require(u16(hdr, 4) == 8, "BigTIFF offset size must be 8")
        true
      case m => throw new IllegalArgumentException(s"not a TIFF: magic $m")
    }
    // walk the IFD chain to the requested directory (each IFD ends with a
    // pointer to the next; 0 terminates)
    var ifdOff = if (big) u64(hdr, 8) else u32(hdr, 4)
    val entrySize = if (big) 20 else 12
    def entryCountAt(off: Long): Int = {
      val cb = new Array[Byte](8)
      if (big) { in.readFully(off, cb, 0, 8); u64(cb, 0).toInt }
      else { in.readFully(off, cb, 0, 2); u16(cb, 0) }
    }
    var skip = ifdIndex
    while (skip > 0) {
      val n = entryCountAt(ifdOff)
      val nextPos = ifdOff + (if (big) 8 else 2) + n.toLong * entrySize
      val nb = new Array[Byte](8)
      in.readFully(nextPos, nb, 0, if (big) 8 else 4)
      val nextOff = if (big) u64(nb, 0) else u32(nb, 0)
      require(nextOff != 0, s"TIFF has no IFD $ifdIndex (chain ends at ${ifdIndex - skip})")
      ifdOff = nextOff
      skip -= 1
    }

    // entry: tag(2) type(2) count(4|8) value(4|8)
    val nEntries = entryCountAt(ifdOff)
    val entriesOff = ifdOff + (if (big) 8 else 2)
    val entries = new Array[Byte](nEntries * entrySize)
    in.readFully(entriesOff, entries, 0, entries.length)

    // tag -> (type, count, value-or-offset bytes position in `entries`)
    final case class Entry(typ: Int, count: Long, valPos: Int)
    val tags = (0 until nEntries).map { i =>
      val o = i * entrySize
      val tag = u16(entries, o)
      val typ = u16(entries, o + 2)
      val count = if (big) u64(entries, o + 4) else u32(entries, o + 4)
      tag -> Entry(typ, count, o + (if (big) 12 else 8))
    }.toMap

    def valueBytes(e: Entry): Array[Byte] = {
      val size = TypeSize.getOrElse(e.typ, 1) * e.count
      val inlineMax = if (big) 8 else 4
      if (size <= inlineMax) {
        val b = new Array[Byte](size.toInt)
        System.arraycopy(entries, e.valPos, b, 0, size.toInt)
        b
      } else {
        val off =
          if (big) u64(entries, e.valPos)
          else u32(entries, e.valPos)
        val b = new Array[Byte](size.toInt)
        in.readFully(off, b, 0, size.toInt)
        b
      }
    }
    def longs(tag: Int): Option[Array[Long]] = tags.get(tag).map { e =>
      val b = valueBytes(e)
      val w = TypeSize(e.typ)
      Array.tabulate(e.count.toInt) { i =>
        w match {
          case 2 => u16(b, i * 2).toLong
          case 4 => u32(b, i * 4)
          case 8 => u64(b, i * 8)
          case 1 => (b(i) & 0xff).toLong
        }
      }
    }
    def scalar(tag: Int, default: Long): Long =
      longs(tag).flatMap(_.headOption).getOrElse(default)
    def ascii(tag: Int): Option[String] = tags.get(tag).map { e =>
      new String(valueBytes(e), java.nio.charset.StandardCharsets.US_ASCII)
        .takeWhile(_ != '\u0000').trim
    }

    val width = scalar(256, -1).toInt
    val height = scalar(257, -1).toInt
    require(width > 0 && height > 0, "TIFF missing ImageWidth/ImageLength")
    val spp = scalar(277, 1).toInt
    val bits = longs(258).map(_.head.toInt).getOrElse(1)
    require(
      Set(8, 16, 32, 64).contains(bits),
      s"unsupported BitsPerSample $bits (8/16/32/64 only)")
    val fmt = scalar(339, 1).toInt
    require(fmt >= 1 && fmt <= 3, s"unsupported SampleFormat $fmt")
    val planar = scalar(284, 1).toInt
    val compression = scalar(259, 1).toInt
    require(
      Set(1, 5, 8, 32773, 32946).contains(compression),
      s"unsupported Compression $compression (none/LZW/Deflate/PackBits only)")
    val predictor = scalar(317, 1).toInt
    require(predictor >= 1 && predictor <= 3, s"unsupported Predictor $predictor")
    val nodata = ascii(42113).flatMap { s =>
      try Some(if (s.equalsIgnoreCase("nan")) Double.NaN else s.toDouble)
      catch { case _: NumberFormatException => None }
    }

    val tiled = tags.contains(322)
    val (bw, bh, offs, counts) =
      if (tiled) {
        val tw = scalar(322, -1).toInt
        val th = scalar(323, -1).toInt
        (tw, th, longs(324).get, longs(325).get)
      } else {
        val rps = math.min(scalar(278, Long.MaxValue), height.toLong).toInt
        (width, rps, longs(273).get, longs(279).get)
      }
    // planar=2: the offsets array holds plane 0's blocks first, then plane
    // 1's, ... — band 1 is exactly the first blocksPerPlane entries
    val across = (width + bw - 1) / bw
    val down = (height + bh - 1) / bh
    val perPlane = across * down
    val nPlanes = if (planar == 2) spp else 1
    require(
      offs.length == perPlane * nPlanes && counts.length == offs.length,
      s"block count mismatch: ${offs.length} offsets for $perPlane×$nPlanes blocks")
    Layout(
      width, height, bits, fmt, spp, planar, compression, predictor, tiled,
      bw, bh, offs.take(perPlane), counts.take(perPlane), nodata)
  }

  // ---- block decompression ------------------------------------------

  def inflate(src: Array[Byte], dstLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(src)
    val dst = new Array[Byte](dstLen)
    var at = 0
    while (at < dstLen && !inf.finished()) {
      val n = inf.inflate(dst, at, dstLen - at)
      if (n == 0 && inf.needsInput()) throw new java.io.EOFException("truncated deflate block")
      at += n
    }
    inf.end()
    dst
  }

  def unpackBits(src: Array[Byte], dstLen: Int): Array[Byte] = {
    val dst = new Array[Byte](dstLen)
    var i = 0
    var o = 0
    while (o < dstLen && i < src.length) {
      val n = src(i); i += 1
      if (n >= 0) { // n+1 literal bytes
        System.arraycopy(src, i, dst, o, n + 1); i += n + 1; o += n + 1
      } else if (n != -128) { // next byte repeats 1-n times
        val b = src(i); i += 1
        var k = 1 - n
        while (k > 0) { dst(o) = b; o += 1; k -= 1 }
      }
    }
    dst
  }

  /** TIFF-variant LZW: MSB-first codes starting at 9 bits, Clear=256,
    * EOI=257, code width grows at 511/1023/2047 minus one (the spec's
    * "early change"). Table entries as prefix/suffix arrays; strings are
    * written back-to-front into the output.
    */
  def lzwDecode(src: Array[Byte], dstLen: Int): Array[Byte] = {
    val dst = new Array[Byte](dstLen)
    // Contiguous-copy decode: consecutive emissions are back-to-back in
    // dst, so the entry built after emitting `old` then `code` — old's
    // string plus the first char of code's — is exactly the already-written
    // region [start(old), start(old) + len(old) + 1). Entries are therefore
    // (pos, len) slices of dst and emission is one forward arraycopy, not a
    // reversed prefix-chain walk — parity on incompressible data (entries
    // stay ~1 byte), increasingly ahead the longer the matches on real
    // (smooth) raster bands.
    val pos = new Array[Int](4096)
    val len = new Array[Int](4096)
    var next = 258
    var bits = 9
    // MSB-first bit reader over a byte accumulator (the per-bit loop was
    // an earlier hot spot: 38 → 67 Mpx/s single-core)
    var acc = 0L
    var accBits = 0
    var srcPos = 0

    def read(): Int = {
      while (accBits < bits && srcPos < src.length) {
        acc = (acc << 8) | (src(srcPos) & 0xffL)
        srcPos += 1
        accBits += 8
      }
      if (accBits < bits) return 257 // implicit EOI at stream end
      accBits -= bits
      ((acc >>> accBits) & ((1L << bits) - 1)).toInt
    }

    var out = 0
    var prevStart = -1 // where the previous emission (old's string) starts
    var old = -1
    var code = read()
    while (code != 257 && out < dstLen) {
      if (code == 256) { next = 258; bits = 9; old = -1; prevStart = -1 }
      else if (old < 0) {
        require(code < 256, s"LZW: first code after clear must be literal, got $code")
        require(out < dstLen, "LZW output overruns the block")
        prevStart = out
        dst(out) = code.toByte
        out += 1
        old = code
      } else {
        require(code <= next && next < 4096, s"LZW: code $code out of range (next=$next)")
        val oldLen = if (old < 256) 1 else len(old)
        val start = out
        if (code == next) {
          // KwKwK: emit old's string + its first char; source region ends
          // exactly at `out`, so the copy does not overlap its destination
          require(out + oldLen + 1 <= dstLen, "LZW output overruns the block")
          System.arraycopy(dst, prevStart, dst, out, oldLen)
          dst(out + oldLen) = dst(prevStart)
          out += oldLen + 1
        } else if (code < 256) {
          require(out < dstLen, "LZW output overruns the block")
          dst(out) = code.toByte
          out += 1
        } else {
          val n = len(code)
          require(out + n <= dstLen, "LZW output overruns the block")
          System.arraycopy(dst, pos(code), dst, out, n)
          out += n
        }
        // the new entry = old.str + first char of this emission — the
        // contiguous region starting at old's emission
        pos(next) = prevStart
        len(next) = oldLen + 1
        next += 1
        prevStart = start
        old = code
      }
      if (old >= 0 && next == (1 << bits) - 1 && bits < 12) bits += 1
      code = read()
    }
    dst
  }

  // ---- predictors ----------------------------------------------------

  /** Predictor 2: per-row horizontal differencing over same-sample lanes,
    * integer add modulo the sample width. Operates in place on the
    * decompressed block bytes.
    */
  private def undoHorizontal(
      b: Array[Byte], rows: Int, cols: Int, lanes: Int, bytes: Int, le: Boolean): Unit = {
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val rowBytes = cols * lanes * bytes
    var r = 0
    while (r < rows) {
      val base = r * rowBytes
      bytes match {
        case 1 =>
          var i = lanes
          while (i < rowBytes) { b(base + i) = (b(base + i) + b(base + i - lanes)).toByte; i += 1 }
        case 2 =>
          val sb = ByteBuffer.wrap(b, base, rowBytes).order(order).asShortBuffer()
          var i = lanes
          while (i < cols * lanes) { sb.put(i, (sb.get(i) + sb.get(i - lanes)).toShort); i += 1 }
        case 4 =>
          val ib = ByteBuffer.wrap(b, base, rowBytes).order(order).asIntBuffer()
          var i = lanes
          while (i < cols * lanes) { ib.put(i, ib.get(i) + ib.get(i - lanes)); i += 1 }
        case 8 =>
          val lb = ByteBuffer.wrap(b, base, rowBytes).order(order).asLongBuffer()
          var i = lanes
          while (i < cols * lanes) { lb.put(i, lb.get(i) + lb.get(i - lanes)); i += 1 }
      }
      r += 1
    }
  }

  /** Predictor 3 (floating point): each row's bytes were split into
    * byte-significance planes (MSB plane first, big-endian order
    * regardless of file byte order) and then byte-wise differenced.
    * Undo = byte cumulative sum across the row, then regather each value
    * from its planes. Returns a NEW array in big-endian value order.
    */
  private def undoFloatPredictor(
      b: Array[Byte], rows: Int, cols: Int, lanes: Int, bytes: Int): Array[Byte] = {
    val rowBytes = cols * lanes * bytes
    val outArr = new Array[Byte](b.length)
    val vals = cols * lanes
    var r = 0
    while (r < rows) {
      val base = r * rowBytes
      var i = base + 1
      while (i < base + rowBytes) { b(i) = (b(i) + b(i - 1)).toByte; i += 1 }
      var v = 0
      while (v < vals) {
        var k = 0
        while (k < bytes) {
          outArr(base + v * bytes + k) = b(base + k * vals + v)
          k += 1
        }
        v += 1
      }
      r += 1
    }
    outArr
  }

  // ---- pixel cursor --------------------------------------------------

  /** Streams band-1 samples of every block in order, tile padding clipped,
    * nodata mapped to NaN. One decompressed block lives at a time.
    */
  final class PixelCursor(in: SeekableBytes, ifdIndex: Int = 0) {
    private val layout = readLayout(in, ifdIndex)
    private val le = { // re-detect byte order for the sample views
      val h = new Array[Byte](2); in.readFully(0, h, 0, 2); h(0) == 'I'
    }
    private val bytesPer = layout.bitsPerSample / 8
    private val lanes = if (layout.planar == 2) 1 else layout.samplesPerPixel
    private val across = (layout.width + layout.blockWidth - 1) / layout.blockWidth

    val width: Int = layout.width
    val height: Int = layout.height
    val totalPixels: Long = layout.width.toLong * layout.height

    private var block = -1
    private var buf: ByteBuffer = _
    private var rowsInBlock = 0
    private var colsInBlock = 0
    private var r = 0
    private var c = 0
    private var cur = 0.0

    private def loadBlock(i: Int): Unit = {
      val raw = new Array[Byte](layout.byteCounts(i).toInt)
      in.readFully(layout.offsets(i), raw, 0, raw.length)
      // a tile decompresses to the FULL padded tile; only the final strip
      // is short
      val blockRow = i / across
      val blockCol = i % across
      rowsInBlock =
        if (layout.tiled) layout.blockHeight
        else math.min(layout.blockHeight, layout.height - blockRow * layout.blockHeight)
      colsInBlock = layout.blockWidth
      val dstLen = rowsInBlock * colsInBlock * lanes * bytesPer
      var bytes = layout.compression match {
        case 1     => java.util.Arrays.copyOf(raw, dstLen)
        case 5     => lzwDecode(raw, dstLen)
        case 32773 => unpackBits(raw, dstLen)
        case _     => inflate(raw, dstLen)
      }
      var order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      layout.predictor match {
        case 2 => undoHorizontal(bytes, rowsInBlock, colsInBlock, lanes, bytesPer, le)
        case 3 =>
          bytes = undoFloatPredictor(bytes, rowsInBlock, colsInBlock, lanes, bytesPer)
          order = ByteOrder.BIG_ENDIAN // plane gather reassembles big-endian
        case _ => ()
      }
      buf = ByteBuffer.wrap(bytes).order(order)
      // clip the emit window to the image edge
      val x0 = blockCol * layout.blockWidth
      val y0 = blockRow * layout.blockHeight
      colsInBlock = math.min(layout.blockWidth, layout.width - x0)
      rowsInBlock = math.min(rowsInBlock, layout.height - y0)
      r = 0
      c = -1
    }

    private def sampleAt(row: Int, col: Int): Double = {
      val idx = (row * layout.blockWidth + col) * lanes // band 1 = lane 0
      val v = (layout.sampleFormat, layout.bitsPerSample) match {
        case (3, 32) => buf.getFloat(idx * 4).toDouble
        case (3, 64) => buf.getDouble(idx * 8)
        case (1, 8)  => (buf.get(idx) & 0xff).toDouble
        case (2, 8)  => buf.get(idx).toDouble
        case (1, 16) => (buf.getShort(idx * 2) & 0xffff).toDouble
        case (2, 16) => buf.getShort(idx * 2).toDouble
        case (1, 32) => (buf.getInt(idx * 4) & 0xffffffffL).toDouble
        case (2, 32) => buf.getInt(idx * 4).toDouble
        case (1, 64) => // unsigned 64 → double
          val l = buf.getLong(idx * 8)
          if (l >= 0) l.toDouble else (l >>> 1).toDouble * 2.0 + (l & 1L).toDouble
        case (2, 64) => buf.getLong(idx * 8).toDouble
        case (f, b) =>
          throw new IllegalArgumentException(s"unsupported sample format $f bits $b")
      }
      layout.nodata match {
        case Some(nd) if v == nd || (nd.isNaN && v.isNaN) => Double.NaN
        case _                                            => v
      }
    }

    def next(): Boolean = {
      c += 1
      if (block >= 0 && c >= colsInBlock) { c = 0; r += 1 }
      while (block < 0 || r >= rowsInBlock) {
        block += 1
        if (block >= layout.offsets.length) return false
        loadBlock(block)
        c = 0
      }
      cur = sampleAt(r, c)
      true
    }

    def value(): Double = cur
  }
}
