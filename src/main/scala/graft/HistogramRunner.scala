package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{BinMethod, BinSpec}
import graft.operators.{HistogramOps, PercentileOps}

/** The reference's CLI surface (E3 — reference: compute_histogram/main.py:17-57,
  * README.md:22-31) as a config object + runner.
  *
  * Differences from the reference, both documented in SURVEY §7.4:
  *  - `minmaxOnly` actually stops after the stats pass (the reference parses
  *    the flag but never checks it — main.py:29-33 vs :53-57);
  *  - min/max start un-clamped; `clampToZero = true` restores the
  *    reference's zero-initialized accumulators (main.py:131-132).
  * When both `minValue` and `maxValue` are given the stats pass is skipped,
  * exactly like the reference (main.py:53-54).
  */
final case class HistogramConfig(
    valueCol: String,
    method: BinMethod = BinMethod.Linear,
    minValue: Option[Double] = None,
    maxValue: Option[Double] = None,
    minmaxOnly: Boolean = false,
    clampToZero: Boolean = false,
    legacyLogOffset100: Boolean = false)

object HistogramRunner {

  /** Run the configured pipeline. `minmaxOnly` returns the 1-row stats
    * relation; otherwise the dense `(value, cnt)` histogram.
    */
  def run(df: DataFrame, cfg: HistogramConfig): DataFrame = {
    val values = HistogramOps.validValues(df, cfg.valueCol)
    if (cfg.minmaxOnly) {
      import org.apache.spark.sql.functions._
      val base = values.agg(min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      if (cfg.clampToZero)
        base.select(
          least(col("min_value"), lit(0.0)).as("min_value"),
          greatest(col("max_value"), lit(0.0)).as("max_value"))
      else base
    } else {
      val (mn, mx) = (cfg.minValue, cfg.maxValue) match {
        case (Some(a), Some(b)) => (a, b)
        case _                  => HistogramOps.minMax(values, cfg.clampToZero)
      }
      HistogramOps.histogram(values, BinSpec.derive(mn, mx, cfg.method), cfg.legacyLogOffset100)
    }
  }

  /** Histogram + decile summary in one call (the full reference workflow:
    * histogram.csv → compute_histogram.sql).
    */
  def runWithDeciles(df: DataFrame, cfg: HistogramConfig): DataFrame =
    PercentileOps.deciles(run(df, cfg.copy(minmaxOnly = false)))

  /** The fully source-pushed two-pass pipeline over the DSv2 raster scan:
    * pass 1 reads `mode=stats` (ONE row per tile crosses the scan
    * boundary), pass 2 reads `mode=hist` (≤ bins rows per tile) and the
    * engine only merges + densifies. Output is bit-identical to
    * [[run]] over the raw `mode=values` scan (RasterAggSpec pins it) —
    * this is the reference's own worker/driver split (per-worker
    * `get_min_max` / `process_sources`, driver-side fold) expressed as
    * scan modes, and the shape that survives 40000²-pixel tiles: the
    * exchange after the scan carries bins, not pixels.
    */
  def runPushed(
      spark: SparkSession,
      tileListPath: String,
      pixelsPerTile: Long,
      cfg: HistogramConfig): DataFrame = {
    import org.apache.spark.sql.functions._
    def read(mode: String, extra: Map[String, String] = Map.empty) = {
      val base = spark.read
        .format("graft.sources.raster.RasterSource")
        .option("tileListPath", tileListPath)
        .option("pixelsPerTile", pixelsPerTile)
        .option("mode", mode)
      extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
    }
    val (mn, mx) = (cfg.minValue, cfg.maxValue) match {
      case (Some(a), Some(b)) => (a, b)
      case _ =>
        val row = read("stats")
          .agg(min(col("min_value")), max(col("max_value")))
          .head()
        val (a, b) = if (row.isNullAt(0)) (0.0, 0.0) else (row.getDouble(0), row.getDouble(1))
        if (cfg.clampToZero) (math.min(a, 0.0), math.max(b, 0.0)) else (a, b)
    }
    val spec = BinSpec.derive(mn, mx, cfg.method)
    val binned = read(
      "hist",
      Map(
        "binLo" -> spec.lo.toString,
        "binHi" -> spec.hi.toString,
        "binOffset" -> spec.offset.toString,
        "binMethod" -> cfg.method.name,
        "legacyLogOffset100" -> cfg.legacyLogOffset100.toString))
    HistogramOps.histogramFromBinned(binned.select(col("code"), col("cnt")), spec)
  }

  /** CLI-shaped main: runMain graft.HistogramRunner <source> <valueCol>
    * [linear|log] [outDir] — writes the reference's CSV format (S5).
    *
    * `<source>` is a Parquet table path, or a `.txt` tile list (S4 —
    * one URI per line, like the reference's bio_*_list.txt), which routes
    * through the DataSource V2 raster scan (S3) for the complete reference
    * program shape: tile list → per-tile scan → 2-pass histogram → CSV.
    */
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val valueCol = args(1)
    val method = if (args.length > 2) BinMethod.parse(args(2)) else BinMethod.Linear
    val out = if (args.length > 3) args(3) else "target/histogram_csv"
    val spark = SparkSession
      .builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val pixels = sys.env.getOrElse("SPARK_GRAFT_PIXELS", "100000").toLong
    val pushed = path.endsWith(".txt") &&
      !sys.env.get("SPARK_GRAFT_PUSHED").contains("0")
    val histo0 =
      if (pushed) {
        // default for tile lists: the per-tile stats/hist passes run
        // INSIDE the scan (mode=stats / mode=hist readers) — bins, not
        // pixels, cross the scan boundary (RasterPushStress: 7.5× cold /
        // 2× warm at 32×2M px; the gap is the pixel volume at real sizes)
        runPushed(spark, path, pixels, HistogramConfig(valueCol, method))
      } else {
        val source =
          if (path.endsWith(".txt")) {
            // the list path streams straight into the DSv2 scan's partition
            // planning — no driver-side collect()-and-comma-join of URIs
            // (round-1 review: at 10⁵-10⁶ tiles that was a driver bottleneck
            // and a multi-MB option string)
            spark.read
              .format("graft.sources.raster.RasterSource")
              .option("tileListPath", path)
              .option("pixelsPerTile", pixels.toString)
              .load()
          } else spark.read.parquet(path)
        run(source, HistogramConfig(valueCol, method))
      }
    // persist: writeCsv and the bin count would otherwise each run the
    // full two-pass pipeline from scratch
    val histo = histo0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    HistogramOps.writeCsv(histo, out)
    println(s"HISTOGRAM_BINS=${histo.count()} OUT=$out")
    histo.unpersist()
    spark.stop()
  }
}
