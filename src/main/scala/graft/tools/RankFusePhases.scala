package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch phase-timer for the round-9 RankOps fusion work: times the
  * dense vs sparse cumBins histogram build and the multiNtileCuts phases
  * in isolation at sf0.1, so constant-shaving targets the measured phase
  * rather than the suspected one.
  */
object RankFusePhases {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val line = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val base = line
      .select(
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
          .as("ship_day"),
        col("l_orderkey"),
        col("l_linenumber"))
      .withColumn("layout", lit("natural"))
      .persist()
    println(s"rows=${base.count()}")

    def run(label: String)(mk: => DataFrame): Unit = {
      // warm + 2 timed
      for (i <- 0 until 3) time(s"$label run$i")(mk.queryExecution.toRdd.count())
    }

    val nBins = 4096
    def binCol: org.apache.spark.sql.Column = {
      // global stats precomputed inline for the scratch comparison
      least(lit(nBins - 1L), floor((col("ship_day").cast("double") - lit(0.0)) / lit(12000.0) * nBins)).cast("int")
    }

    run("sparse groupBy(bin)") {
      base.select(binCol.as("gr_bin"))
        .groupBy(col("gr_bin")).agg(count(lit(1)).as("gr_cnt"))
    }
    run("dense udaf hist") {
      val agg = udaf(new graft.functions.DenseHistogram(0, nBins),
        org.apache.spark.sql.Encoders.scalaInt)
      base.select(binCol.as("gr_bin")).agg(agg(col("gr_bin")).as("gr_h"))
    }
    run("rowsAboveRank cut0 (current)") {
      graft.operators.RankOps.rowsAboveRank(
        base, Seq("layout"), Seq("ship_day", "l_orderkey", "l_linenumber"), lit(0L))
    }

    // rfm-shaped: multiNtileCuts phases over the per-customer aggregate
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val perCust = orders
      .groupBy(col("o_custkey"))
      .agg(
        max(expr("cast(cast(o_orderdate as timestamp) as long) div 86400")).as("last_day"),
        count(lit(1)).as("freq"),
        sum((col("o_totalprice") * 100).cast("long")).as("monetary_c"))
      .withColumn("recency_key", -col("last_day"))
      .persist()
    println(s"custs=${perCust.count()}")
    val dims = Seq(1 -> col("recency_key"), 2 -> (-col("freq")), 3 -> (-col("monetary_c")))
    for (i <- 0 until 3)
      time(s"multiNtileCuts full run$i") {
        graft.operators.RankOps.multiNtileCuts(perCust, dims, "o_custkey", 5)
      }
    // sub-phase floor measurements over the cached 15k-row relation
    for (i <- 0 until 3) {
      time(s"stats-collect run$i") {
        perCust.agg(count(lit(1)), min(col("recency_key")), max(col("recency_key")),
          min(col("freq")), max(col("freq")), min(col("monetary_c")), max(col("monetary_c")),
          min(col("o_custkey")), max(col("o_custkey"))).collect()
      }
      time(s"hist-collect run$i") {
        val agg = udaf(new graft.functions.DenseHistogram(0, 4096),
          org.apache.spark.sql.Encoders.scalaInt)
        perCust.select(
            least(lit(4095L), floor((col("recency_key").cast("double") + lit(20000.0)) / lit(40000.0) * 4096)).cast("int").as("b1"),
            least(lit(4095L), floor((col("freq").cast("double")) / lit(100.0) * 4096)).cast("int").as("b2"),
            least(lit(4095L), floor((col("monetary_c").cast("double")) / lit(1e9) * 4096)).cast("int").as("b3"))
          .agg(agg(col("b1")), agg(col("b2")), agg(col("b3"))).collect()
      }
      time(s"hist-sparse-collect run$i") {
        perCust.select(explode(array(
            struct(lit(1).as("d"), least(lit(4095L), floor((col("recency_key").cast("double") + lit(20000.0)) / lit(40000.0) * 4096)).cast("int").as("b")),
            struct(lit(2).as("d"), least(lit(4095L), floor((col("freq").cast("double")) / lit(100.0) * 4096)).cast("int").as("b")),
            struct(lit(3).as("d"), least(lit(4095L), floor((col("monetary_c").cast("double")) / lit(1e9) * 4096)).cast("int").as("b")))).as("e"))
          .groupBy(col("e.d"), col("e.b")).agg(count(lit(1)).as("c")).collect()
      }
      time(s"tiny-window run$i") {
        import org.apache.spark.sql.expressions.Window
        perCust.filter(col("o_custkey") % 1000 === 0)
          .withColumn("rk", row_number().over(Window.partitionBy(col("freq")).orderBy(col("o_custkey"))))
          .groupBy().agg(max(col("rk"))).queryExecution.toRdd.count()
      }
    }
    run("ntileCuts longform (old shape)") {
      val longForm = perCust.select(
        col("o_custkey"),
        explode(array(
          struct(lit(1).as("dim"), col("recency_key").as("v")),
          struct(lit(2).as("dim"), (-col("freq")).as("v")),
          struct(lit(3).as("dim"), (-col("monetary_c")).as("v")))).as("t"))
        .select(col("t.dim").as("dim"), col("t.v").as("v"), col("o_custkey"))
      graft.operators.RankOps.ntileCuts(longForm, Seq("dim"), Seq("v", "o_custkey"), 5)
    }
    spark.stop()
  }
}
