package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.RankOps

/** Scale-up stress for the generalized RankOps machinery (round 8): time
  * `rankBuckets` / `rowsAboveRank` against their window-function twins
  * (`ntile`, `row_number`) on synthetic relations of growing cardinality —
  * the regime where the twins funnel the whole relation into one task's
  * sort while RankOps' per-task work stays bounded by ~n/4096.
  *
  * Three shapes per size:
  *   spread   — values hash-spread over a 100k domain (the normal path);
  *   all-tied — every value identical, numeric unique tiebreak (the
  *              round-8 fallback path: bins on the tiebreak's range);
  *   one-bin  — every value identical, STRING tiebreak (the pre-round-8
  *              degenerate behavior kept for comparison: all rows land in
  *              one bin and the rank window runs on a single task — this
  *              upper-bounds what the fallback saves).
  * Usage: runMain graft.tools.RankStress [maxRows] (default 64000000)
  */
object RankStress {
  def main(args: Array[String]): Unit = {
    val maxRows = if (args.nonEmpty) args(0).toLong else 64000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    def ntileTwin(df: DataFrame, tiebreak: String): Long =
      df.withColumn("b", ntile(5).over(Window.orderBy(col("v"), col(tiebreak))))
        .groupBy(col("b")).count().count()

    def buckets(df: DataFrame, tiebreak: String): Long =
      RankOps
        .rankBuckets(df.withColumn("g", lit(0)), Seq("g"), Seq("v", tiebreak), 5, "b")
        .groupBy(col("b")).count().count()

    var rows = 1000000L
    while (rows <= maxRows) {
      println(s"rows $rows:")
      // deterministic hash-spread values; id is the unique numeric tiebreak
      val spread = spark.range(rows).select(
        pmod(col("id") * lit(2654435761L), lit(100000L)).as("v"), col("id"))
      val tied = spark.range(rows).select(lit(7L).as("v"), col("id"))
      val tiedStr = spark.range(rows).select(
        lit(7L).as("v"), format_string("id_%012d", col("id")).as("sid"))

      t("rankBuckets spread          ")(buckets(spread, "id"))
      t("ntile twin  spread          ")(ntileTwin(spread, "id"))
      t("rankBuckets all-tied (fallback)")(buckets(tied, "id"))
      t("rankBuckets one-bin (string tb)")(buckets(tiedStr, "sid"))
      t("rowsAboveRank top-quartile  ")(
        RankOps
          .rowsAboveRank(
            spread.withColumn("g", lit(0)), Seq("g"), Seq("v", "id"),
            expr("gr_n div 4") * 3 + least(lit(3L), expr("gr_n % 4")))
          .count())
      t("row_number twin top-quartile")(
        spread
          .withColumn("p", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
          .crossJoin(broadcast(spread.agg(count(lit(1)).as("n"))))
          .filter(col("p") > expr("n div 4") * 3 + least(lit(3L), expr("n % 4")))
          .count())
      rows *= 4
    }
    spark.stop()
  }
}
