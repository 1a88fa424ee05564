package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch bench for the scan-starvation respread design (round 14):
  * times variants of profile_approx's melt→hash→HLL pipeline so the
  * Spread helper's mechanism is chosen from measurements, not guesses.
  * Usage: runMain graft.tools.SpreadLab [sfDir]
  */
object SpreadLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def base = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def melt(df: DataFrame, keep: Seq[String] = Nil): DataFrame =
      df.select(
        (keep.map(col) :+ explode(array(cols.map(c =>
          struct(lit(c).as("col_name"),
            when(isnan(col(c).cast("double")), lit(null)).otherwise(col(c).cast("double")).as("v"))): _*)).as("cv")): _*)
        .select((keep.map(col) :+ col("cv.col_name").as("col_name") :+ col("cv.v").as("v")): _*)
    def sketch(m: DataFrame): DataFrame = {
      val h = graft.functions.PortableHash.hash60((col("v") * lit(100.0)).cast("bigint").cast("string"))
      m.select(col("col_name"), col("v"),
          graft.operators.SketchOps.bucketOf(h).as("bucket"),
          graft.operators.SketchOps.rankOf(h).as("rank"))
        .groupBy(col("col_name"), col("bucket"))
        .agg(count(lit(1)).as("n_rows_p"), count(col("v")).as("n_nonnull_p"),
          min(col("v")).as("min_p"), max(col("v")).as("max_p"), max(col("rank")).as("m_j"))
        .groupBy(col("col_name"))
        .agg(sum(col("n_rows_p")).as("n_rows"), sum(col("n_nonnull_p")).as("n_nonnull"),
          count(col("bucket")).as("n_buckets"),
          sum(expr("shiftleft(cast(1 as bigint), 53 - m_j)")).as("z_present"),
          min(col("min_p")).as("min_v"), max(col("max_p")).as("max_v"))
    }
    val n = cpus.toInt
    def sliced: DataFrame = {
      // N parallel scans of the same single-row-group file, each keeping a
      // deterministic 1/N hash slice: decode is paid N× in CPU-seconds but
      // runs wall-clock-parallel on otherwise-idle cores
      val slices = (0 until n).map { i =>
        base.select(cols.map(col): _*)
          .where(pmod(xxhash64(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
            lit(0)), lit(n)) === i)
      }
      slices.reduce(_ unionAll _)
    }
    def meltPos(df: DataFrame): DataFrame =
      df.select(posexplode(array(cols.map(c =>
        when(isnan(col(c).cast("double")), lit(null)).otherwise(col(c).cast("double"))): _*))
        .as(Seq("pos", "v")))
    def sketchPos(m: DataFrame, distinctFirst: Boolean): DataFrame = {
      val h = graft.functions.PortableHash.hash60((col("v") * lit(100.0)).cast("bigint").cast("string"))
      val perBucket =
        if (distinctFirst)
          m.groupBy(col("pos"), col("v")).agg(count(lit(1)).as("cnt"))
            .select(col("pos"), col("v"), col("cnt"),
              graft.operators.SketchOps.bucketOf(h).as("bucket"),
              graft.operators.SketchOps.rankOf(h).as("rank"))
            .groupBy(col("pos"), col("bucket"))
            .agg(sum(col("cnt")).as("n_rows_p"),
              sum(when(col("v").isNotNull, col("cnt")).otherwise(lit(0L))).as("n_nonnull_p"),
              min(col("v")).as("min_p"), max(col("v")).as("max_p"), max(col("rank")).as("m_j"))
        else
          m.select(col("pos"), col("v"),
              graft.operators.SketchOps.bucketOf(h).as("bucket"),
              graft.operators.SketchOps.rankOf(h).as("rank"))
            .groupBy(col("pos"), col("bucket"))
            .agg(count(lit(1)).as("n_rows_p"), count(col("v")).as("n_nonnull_p"),
              min(col("v")).as("min_p"), max(col("v")).as("max_p"), max(col("rank")).as("m_j"))
      perBucket
        .groupBy(col("pos"))
        .agg(sum(col("n_rows_p")).as("n_rows"), sum(col("n_nonnull_p")).as("n_nonnull"),
          count(col("bucket")).as("n_buckets"),
          sum(expr("shiftleft(cast(1 as bigint), 53 - m_j)")).as("z_present"),
          min(col("min_p")).as("min_v"), max(col("max_p")).as("max_v"))
        .select(element_at(array(cols.map(lit): _*), col("pos") + 1).as("col_name"),
          col("n_rows"), col("n_nonnull"), col("n_buckets"), col("z_present"), col("min_v"), col("max_v"))
        .orderBy(col("col_name"))
    }
    def spreadRaw: DataFrame =
      base.repartition(n,
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(n * 64)))
        .select(cols.map(col): _*)
    def colsProfile(m: DataFrame): DataFrame =
      m.groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("col_name"))
        .agg(sum(col("cnt")).as("n_rows"),
          sum(when(col("v").isNotNull, col("cnt")).otherwise(lit(0L))).as("n_nonnull"),
          count(col("v")).as("n_distinct"), min(col("v")).as("min_v"), max(col("v")).as("max_v"),
          sum(col("cnt") * (col("v") * lit(100.0)).cast("bigint")).as("sum_cents"))
        .orderBy(col("col_name"))
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "A_plain" -> (() => sketch(melt(base))),
      "E_str_register" -> (() => sketch(melt(spreadRaw))),
      "E_pos_register" -> (() => sketchPos(meltPos(spreadRaw), distinctFirst = false)),
      "E_pos_distinct" -> (() => sketchPos(meltPos(spreadRaw), distinctFirst = true)),
      "PC_plain" -> (() => colsProfile(melt(base))),
      "PC_spread" -> (() => colsProfile(melt(spreadRaw)))
    )
    for ((name, mk) <- variants; rep <- 0 until 3) {
      val t0 = System.nanoTime()
      val n = mk().queryExecution.toRdd.count()
      println(f"SPREADLAB $name rep$rep rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
