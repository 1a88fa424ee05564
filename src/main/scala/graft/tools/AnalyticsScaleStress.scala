package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LayoutOps, ProfileOps, TextOps}

/** Scale-up stress for the round-4 analytics additions: replicate sf0.1
  * inputs N× with key salting (replicas get distinct users / sources /
  * doc ids, so window-partition and group cardinality grow WITH the data)
  * and time attribution, drift binning, the correlation matrix,
  * compaction planning, TWAP, and the barriered winnow summary at
  * 1×/2×/4×. Linear-ish growth = the operator scales by adding
  * partitions; superlinear growth = a hidden global bottleneck.
  *
  * Timing forces FULL row output (`toRdd.count()`) — the count()-pruned
  * form hid doc_winnow's 625 s blow-up (PERF.md round-4 final).
  * Usage: runMain graft.tools.AnalyticsScaleStress [maxFactor]
  */
object AnalyticsScaleStress {
  def main(args: Array[String]): Unit = {
    val maxFactor = if (args.nonEmpty) args(0).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def t(l: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    var factor = 1
    while (factor <= maxFactor) {
      println(s"factor $factor:")
      val rep = spark.range(factor.toLong).select(col("id").as("copy"))

      // events replicated; user ids salted per copy → per-user windows
      // stay the same size while the user population scales
      // generation-aware ts normalization (Tables.normalizeEventsTs): the
      // raw cast("long") on a TIMESTAMP column yields SECONDS — ts_us was
      // wrong by 1e6 on micros-generation data (ADVICE r6)
      val ev = graft.sources.Tables
        .normalizeEventsTs(spark.read.parquet("/root/testdata/sf0.1/events.parquet"))
        .crossJoin(rep)
        .select(
          (col("user_id") * lit(maxFactor.toLong + 1) + col("copy")).as("user_id"),
          (col("event_id") * lit(maxFactor.toLong + 1) + col("copy")).as("event_id"),
          col("ts_us"), col("event_type"), col("value"))

      t("attribution      ") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        ev.select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
            when(col("value").isNotNull && !isnan(col("value")),
              (col("value") * lit(100.0)).cast("bigint")).as("cents"))
          .withColumn("chan",
            last(when(col("event_type").isin("click", "view"), col("event_type")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("chan"), lit("none")).as("channel"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev_c"))
      }

      t("twap (type,day)  ") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("day"))
          .orderBy(col("ts_us"), col("event_id"))
        ev.filter(col("value").isNotNull && !isnan(col("value")))
          .select(col("event_type"), col("ts_us"), col("event_id"),
            expr("ts_us DIV 86400000000").as("day"),
            (col("value") * lit(100.0)).cast("bigint").as("cents"))
          .withColumn("gap_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
          .filter(col("gap_us").isNotNull)
          .groupBy(col("event_type"))
          .agg(sum((col("cents") * col("gap_us")).cast("decimal(38,0)")).as("wsum"),
            sum(col("gap_us")).as("span"))
      }

      // lineitem replicated (row count scales; the 1-row stats stay 1 row)
      val li = spark.read
        .parquet("/root/testdata/sf0.1/lineitem.parquet")
        .crossJoin(rep)
      t("feature_corr     ")(
        ProfileOps.corrMatrix(li, Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")))

      // documents replicated; sources AND doc ids salted → partition
      // count scales, per-partition packing work constant
      val docs = spark.read
        .parquet("/root/testdata/sf0.1/documents.parquet")
        .crossJoin(rep)
        .select(
          (col("doc_id") * lit(maxFactor.toLong + 1) + col("copy")).as("doc_id"),
          concat(col("source"), lit("#"), col("copy")).as("source"),
          col("n_chars"), col("text"))
      t("compaction_bins  ")(
        LayoutOps.compactionBins(docs, "source", "doc_id", "n_chars", 4000L))
      t("winnow_summary   ")(TextOps.winnowSummary(docs))
      t("doc_repetition   ")(TextOps.repetitionSignals(docs))
      graft.operators.DedupOps.releaseShingleCaches()

      factor *= 2
    }
    spark.stop()
  }
}
