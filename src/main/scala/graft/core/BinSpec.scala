package graft.core

/** Histogram binning method.
  *
  * Mirrors the reference's `-m/--method` CLI option (reference:
  * compute_histogram/main.py:19-21): `linear` quantizes values to 2-decimal
  * fixed point (×100), `log` quantizes to `ln(v + offset) × 1000`
  * (reference: compute_histogram/main.py:161-172, README.md:7-16).
  */
sealed abstract class BinMethod(val name: String)
object BinMethod {
  case object Linear extends BinMethod("linear")
  case object Log extends BinMethod("log")

  def parse(s: String): BinMethod = s match {
    case "linear" => Linear
    case "log"    => Log
    case other    => throw new IllegalArgumentException(s"Unknown method $other")
  }
}

/** Binning specification threaded through the histogram pipeline.
  *
  * `[lo, hi)` are integer bin-code endpoints; there are `bins = hi - lo`
  * width-1 integer bins. Bin `b` covers codes `[b, b+1)` except the last bin
  * `[hi-1, hi]`, which also absorbs code `hi` (numpy `np.histogram` closed
  * last bin; reference: compute_histogram/main.py:248-249). Codes outside
  * `[lo, hi]` are dropped.
  *
  * Reference: the `(histo_range, bins, offset)` triple of
  * compute_histogram/main.py:42-44, derived in `get_range`
  * (compute_histogram/main.py:152-179).
  */
final case class BinSpec(lo: Int, hi: Int, offset: Double, method: BinMethod) {
  require(hi >= lo, s"invalid bin range [$lo, $hi)")
  def bins: Int = hi - lo
}

object BinSpec {

  /** Derive a BinSpec from global min/max — the reference's `get_range`
    * (compute_histogram/main.py:152-179).
    *
    * Linear: `[trunc(min·100) − 10, trunc(max·100) + 10)`, offset 0
    * (compute_histogram/main.py:161-165). `.toInt` truncates toward zero,
    * matching Python `int()`.
    *
    * Log: `offset = |min| + 1` if `min ≤ 0` else 0, then
    * `[trunc(ln(min+offset)·1000), trunc(ln(max+offset)·1000))`
    * (compute_histogram/main.py:166-172). Note: no padding, so the max
    * value's code equals `hi` and lands in the closed last bin.
    *
    * NOTE (reference bug, SURVEY §7.4.1): the reference *quantizes* with a
    * hard-coded `+ 100` offset (compute_histogram/main.py:197) while the
    * range/edges use the computed `offset`. We implement the consistent
    * semantics — the computed `offset` is used everywhere. Pass
    * `legacyLogOffset100 = true` to [[graft.operators.HistogramOps.quantize]]
    * for bug-compatible behavior.
    */
  def derive(minValue: Double, maxValue: Double, method: BinMethod): BinSpec =
    method match {
      case BinMethod.Linear =>
        BinSpec(
          (minValue * 100).toInt - 10,
          (maxValue * 100).toInt + 10,
          0.0,
          BinMethod.Linear)
      case BinMethod.Log =>
        val offset = if (minValue <= 0) math.abs(minValue) + 1 else 0.0
        BinSpec(
          (math.log(minValue + offset) * 1000).toInt,
          (math.log(maxValue + offset) * 1000).toInt,
          offset,
          BinMethod.Log)
    }
}
