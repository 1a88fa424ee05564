package graft.sources.raster

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{BinMethod, BinSpec}

/** Per-tile AGGREGATED scan modes for the raster source — the source-level
  * twin of the reference's worker functions, which never ship raw pixels
  * to the driver either:
  *
  *  - `mode=stats`: one `(tile_uri, min_value, max_value, n_valid)` row per
  *    tile (reference `get_min_max`, compute_histogram/main.py:206-219) —
  *    pass 1 reads 1 row per tile instead of `pixels` rows;
  *  - `mode=hist`: sparse `(tile_uri, code, cnt)` rows per tile under the
  *    engine's exact quantize semantics (reference `process_sources`,
  *    compute_histogram/main.py:182-201) — pass 2 ships ≤ `hi−lo` rows per
  *    tile across the scan boundary instead of `pixels`.
  *
  * Spark's DSv2 aggregate pushdown (`SupportsPushDownAggregates`) cannot
  * express these (it pushes MIN/MAX/COUNT of plain columns, not a grouped
  * aggregation of a quantize EXPRESSION), so the modes are explicit scan
  * options — the engine-side plan on top is unchanged
  * (`groupBy(code).sum(cnt)` merge + densify), and
  * `RasterAggSpec` pins bit-equality with the raw-pixel path.
  *
  * The quantize arithmetic REPLICATES `HistogramOps.quantize` +
  * `binCounts` exactly: `(v·100).toInt` / `(ln(v+off)·1000).toInt`
  * (truncation toward zero = non-ANSI cast), codes outside `[lo, hi]`
  * dropped, code `hi` merged into the closed last bin `hi−1`.
  */
object RasterAggScans {

  /** The shared STUB pixel stream (splitmix64 seeded by the URI, every
    * 97th pixel NaN) — since round 8 used only for offline-unreachable
    * network schemes; openable URIs real-decode via [[GeoTiff]] (see
    * [[RasterDecode]]).
    */
  final class PixelStream(tileUri: String, val pixels: Long) {
    private var state: Long = {
      var h = 1125899906842597L
      tileUri.foreach(c => h = 31 * h + c)
      h
    }
    private var i: Long = -1
    def next(): Boolean = { i += 1; i < pixels }
    def value(): Double = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      if (i % 97 == 96) Double.NaN
      else (z >>> 11).toDouble / (1L << 53).toDouble * 1000.0
    }
  }
}

final class RasterStatsReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RasterInputPartition]
    new RasterStatsPartitionReader(p.tileUri, p.pixels, required, p.overview)
  }
}

/** One (tile_uri, min_value, max_value, n_valid) row per tile. Tiles with
  * zero valid pixels emit NO row — min/max of an empty tile is undefined,
  * matching the reference's `None`-and-filter (main.py:139-140, 211-219)
  * and Spark's null-skipping agg semantics downstream.
  */
final class RasterStatsPartitionReader(
    tileUri: String,
    pixels: Long,
    required: StructType,
    overview: Int = 0)
    extends PartitionReader[InternalRow] {
  private val stream = RasterDecode.open(tileUri, pixels, overview)
  private var done = false
  private var mn = Double.PositiveInfinity
  private var mx = Double.NegativeInfinity
  private var n = 0L

  override def next(): Boolean = {
    if (done) return false
    while (stream.next()) {
      val v = stream.value()
      if (!java.lang.Double.isNaN(v)) {
        if (v < mn) mn = v
        if (v > mx) mx = v
        n += 1
      }
    }
    stream.close()
    done = true
    n > 0
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    var j = 0
    while (j < required.length) {
      row.update(
        j,
        required.fields(j).name match {
          case "tile_uri"  => UTF8String.fromString(tileUri)
          case "min_value" => mn
          case "max_value" => mx
          case "n_valid"   => n
        })
      j += 1
    }
    row
  }

  override def close(): Unit = ()
}

final class RasterHistReaderFactory(
    required: StructType,
    spec: BinSpec,
    legacyLogOffset100: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RasterInputPartition]
    new RasterHistPartitionReader(p.tileUri, p.pixels, required, spec, legacyLogOffset100, p.overview)
  }
}

/** Sparse per-tile histogram rows (tile_uri, code, cnt), non-zero bins
  * only. State is one `hi−lo` long array per tile — the reference's
  * per-worker `np.histogram` buffer.
  */
final class RasterHistPartitionReader(
    tileUri: String,
    pixels: Long,
    required: StructType,
    spec: BinSpec,
    legacyLogOffset100: Boolean,
    overview: Int = 0) extends PartitionReader[InternalRow] {

  private val uriUtf8 = UTF8String.fromString(tileUri)
  private val counts = new Array[Long](math.max(spec.bins, 0))
  private var filled = false
  private var bin = -1

  private val logOffset = if (legacyLogOffset100) 100.0 else spec.offset

  // exact twin of HistogramOps.quantize: truncation-toward-zero cast
  private def code(v: Double): Int = spec.method match {
    case BinMethod.Linear => (v * 100).toInt
    case BinMethod.Log    => (math.log(v + logOffset) * 1000).toInt
  }

  private def fill(): Unit = {
    val stream = RasterDecode.open(tileUri, pixels, overview)
    while (stream.next()) {
      val v = stream.value()
      if (!java.lang.Double.isNaN(v)) {
        val c = code(v)
        // F3 range semantics + numpy closed last bin (code hi → bin hi−1)
        if (c >= spec.lo && c <= spec.hi && spec.bins > 0) {
          val b = if (c == spec.hi) spec.hi - 1 else c
          counts(b - spec.lo) += 1
        }
      }
    }
    stream.close()
    filled = true
  }

  override def next(): Boolean = {
    if (!filled) fill()
    bin += 1
    while (bin < counts.length && counts(bin) == 0) bin += 1
    bin < counts.length
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    var j = 0
    while (j < required.length) {
      row.update(
        j,
        required.fields(j).name match {
          case "tile_uri" => uriUtf8
          case "code"     => spec.lo + bin
          case "cnt"      => counts(bin)
        })
      j += 1
    }
    row
  }

  override def close(): Unit = ()
}
