package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EvalOps

/** Scale-up stress for the round-9 eval audits: replicate the sf0.1
  * embeddings / orders tables N× (keys remapped so groups stay intact)
  * and time binnedAuc / calibrationTable / psiContributions / binnedGini
  * warm at each factor. Replication multiplies every bin count by exactly
  * N while leaving grids, representatives, and ratios unchanged, so AUC,
  * ECE, and Gini are INVARIANT at the operators' 6-decimal rounding
  * (PSI's +1/2 Laplace smoothing adds an O(1/n) drift that vanishes as N
  * grows) — printed beside the timings so the runs double as a
  * correctness check at scale.
  * Usage: runMain graft.tools.EvalStress [factors...] (default 1 8 64)
  */
object EvalStress {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 8, 64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

    factors.foreach { factor =>
      val embPath = s"target/stress/emb_x$factor.parquet"
      if (!new java.io.File(embPath).exists()) {
        spark.read
          .parquet("/root/testdata/sf0.1/embeddings.parquet")
          .crossJoin(spark.range(factor.toLong).select(col("id").as("rep")))
          .select((col("vec_id") * factor + col("rep")).as("vec_id"),
            col("embedding"), col("label"))
          .repartition(32)
          .write.mode("overwrite").parquet(embPath)
      }
      val ordPath = s"target/stress/ord_x$factor.parquet"
      if (!new java.io.File(ordPath).exists()) {
        spark.read
          .parquet("/root/testdata/sf0.1/orders.parquet")
          .crossJoin(spark.range(factor.toLong).select(col("id").as("rep")))
          // custkey remapped per replica: per-customer spend is preserved,
          // the customer population grows N× — gini-invariant replication
          .select((col("o_orderkey") * factor + col("rep")).as("o_orderkey"),
            (col("o_custkey") * factor + col("rep")).as("o_custkey"),
            col("o_totalprice"), col("o_orderdate"))
          .repartition(32)
          .write.mode("overwrite").parquet(ordPath)
      }
      val emb = spark.read.parquet(embPath)
      val ord = spark.read.parquet(ordPath)
      val nEmb = emb.count(); val nOrd = ord.count()

      def aucDf = EvalOps.binnedAuc(emb,
        (element_at(col("embedding"), 1).cast("double") * lit(100000.0)).cast("bigint"),
        when(col("label") <= 4, 1L).otherwise(0L))
      def calDf = EvalOps.calibrationTable(ord,
        // deterministic price-based pseudo-probability in integer micros
        (col("o_totalprice") / (col("o_totalprice") + lit(100000.0)) * lit(1000000.0))
          .cast("bigint"),
        when(col("o_orderkey") % 2 === 0, 1L).otherwise(0L))
      def psiDf = {
        val st = ord.agg(
          min(unix_micros(col("o_orderdate").cast("timestamp"))).as("lo"),
          max(unix_micros(col("o_orderdate").cast("timestamp"))).as("hi"))
          .select(expr("(lo + hi) DIV 2").as("mid"))
        val e = ord.crossJoin(st).select(
          (col("o_totalprice") * lit(100.0)).cast("bigint").as("cents"),
          when(unix_micros(col("o_orderdate").cast("timestamp")) <= col("mid"), 1L)
            .otherwise(0L).as("early"))
        EvalOps.psiContributions(e, col("cents"), col("early"))
      }
      def giniDf = EvalOps.binnedGini(
        ord.groupBy(col("o_custkey"))
          .agg(sum((col("o_totalprice") * lit(100.0)).cast("bigint")).as("cents")),
        col("cents"))

      // round-9 additions: tau-b (cell counts scale N → tau drifts O(1/n)),
      // paired DeLong (AUCs exactly invariant, se shrinks ~1/√N), CUSUM
      // (cp location/means invariant, the statistic itself scales N)
      def kendallDf = EvalOps.binnedKendallTau(
        emb.filter(element_at(col("embedding"), 1).isNotNull &&
          element_at(col("embedding"), 2).isNotNull),
        (element_at(col("embedding"), 1).cast("double") * lit(100000.0)).cast("bigint"),
        (element_at(col("embedding"), 2).cast("double") * lit(100000.0)).cast("bigint"))
      def aucCmpDf = EvalOps.binnedAucCompare(
        emb.filter(element_at(col("embedding"), 1).isNotNull &&
          element_at(col("embedding"), 2).isNotNull),
        (element_at(col("embedding"), 1).cast("double") * lit(100000.0)).cast("bigint"),
        (element_at(col("embedding"), 2).cast("double") * lit(100000.0)).cast("bigint"),
        when(col("label") <= 4, 1L).otherwise(0L))
      def cusumDf = EvalOps.cusumChangepoint(ord,
        col("o_orderdate").cast("date"),
        (col("o_totalprice") * lit(100.0)).cast("bigint"))
      // deviations scale by exactly N under replication → acf invariant
      def acfDf = EvalOps.integerAcf(ord,
        col("o_orderdate").cast("date"),
        (col("o_totalprice") * lit(100.0)).cast("bigint"))

      def run(): Seq[(String, Double)] = Seq(
        "auc" -> time(force(aucDf))._1,
        "calibration" -> time(force(calDf))._1,
        "psi" -> time(force(psiDf))._1,
        "gini" -> time(force(giniDf))._1,
        "kendall" -> time(force(kendallDf))._1,
        "auc_cmp" -> time(force(aucCmpDf))._1,
        "cusum" -> time(force(cusumDf))._1,
        "acf" -> time(force(acfDf))._1)
      run() // warm-up
      val warm = run()
      val auc = aucDf.head().getDouble(2)
      val ece = calDf.agg(sum(col("ece_contrib"))).head().getDouble(0)
      val psi = psiDf.agg(sum(col("psi_contrib"))).head().getDouble(0)
      val gini = giniDf.head().getDouble(2)
      val tau = kendallDf.head().getDouble(3)
      val cmp = aucCmpDf.head()
      val cus = cusumDf.head()
      val acf1 = acfDf.head().getDouble(2)
      println(
        f"factor=$factor%-3d emb=$nEmb%-8d ord=$nOrd%-9d " +
          warm.map { case (n, t) => f"$n=$t%.2fs" }.mkString(" ") +
          f" | invariants: auc=$auc%.6f ece=$ece%.6f gini=$gini%.6f psi~$psi%.6f" +
          f" tau~$tau%.6f d_auc=${cmp.getDouble(4)}%.6f" +
          f" cp=${cus.get(1)} shift=${cus.getDouble(6)}%.6f acf1=$acf1%.6f")
    }
    spark.stop()
  }
}
