package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DeltaOps, LayoutOps, ProfileOps}

/** Scale-up stress for the profiling/layout/delta operators: replicate
  * sf0.1 inputs N× with key salting (replicas get distinct keys, so group
  * cardinality and join keys grow WITH the data — the honest scale-up for
  * keyed operators) and time group quantiles, winsorized stats, Z-cells,
  * and snapshot diff at 1×/2×/4×.
  * Usage: runMain graft.tools.ProfileScaleStress [maxFactor]
  */
object ProfileScaleStress {
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

    def t(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    var factor = 1
    while (factor <= maxFactor) {
      println(s"factor $factor:")
      val rep = spark.range(factor.toLong).select(col("id").as("copy"))

      // events replicated; event_type salted per copy → groups scale too
      val ev = spark.read
        .parquet("/root/testdata/sf0.1/events.parquet")
        .select(col("event_type"), col("value"))
        .crossJoin(rep)
        .select(
          concat(col("event_type"), lit("#"), col("copy")).as("event_type"),
          col("value"))
      t("group_quantiles ")(ProfileOps.groupQuantiles(ev, "event_type", "value").count())

      val li = spark.read
        .parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_partkey"), col("l_suppkey"))
        .crossJoin(rep)
      t("winsorized      ")(
        ProfileOps
          .winsorizedStats(
            li.select(
              concat(col("l_returnflag"), lit("#"), col("copy")).as("l_returnflag"),
              col("l_extendedprice")),
            "l_returnflag",
            "l_extendedprice")
          .count())
      t("profile_approx  ")(
        ProfileOps.profileColumnsApprox(
          spark.read
            .parquet("/root/testdata/sf0.1/lineitem.parquet")
            .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
            .crossJoin(rep),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .queryExecution.toRdd.count())
      t("zorder_cells    ")(
        LayoutOps
          .zCells(
            li.select(
              (col("l_partkey") + col("copy") * 1000000L).as("l_partkey"),
              col("l_suppkey")),
            "l_partkey",
            "l_suppkey",
            k = 1000000)
          .count())

      val ord = spark.read
        .parquet("/root/testdata/sf0.1/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .crossJoin(rep)
        .select(
          (col("o_orderkey") + col("copy") * 100000000L).as("k"),
          (col("o_totalprice") * lit(100.0)).cast("bigint").as("cents"),
          col("o_orderstatus"))
      t("snapshot_diff   ")(
        DeltaOps
          .snapshotDiff(
            ord.filter(pmod(col("k"), lit(97)) =!= 3),
            ord.filter(pmod(col("k"), lit(89)) =!= 7),
            "k",
            Seq(col("cents").cast("string"), col("o_orderstatus")))
          .count())
      factor *= 2
    }
    spark.stop()
  }
}
