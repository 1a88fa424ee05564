package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SkewOps

/** Hot-key stress for the skew-mitigation claims (round-11 verdict #5):
  * ONE key carries 50 % of all rows, the rest spread over 10⁶ cold keys,
  * at 16×/64×/256× the sf0.1 row scale (16 M / 64 M / 256 M rows).
  *
  * Three shapes measured per scale:
  *  - `plain sum`: `groupBy(key).sum` — Spark's two-level hash
  *    aggregation ALREADY partial-combines per map partition, so the hot
  *    reduce key receives ≤ #mapPartitions rows regardless of skew; the
  *    honest expectation is parity with salting, and the measurement
  *    pins that partial aggregation, not salting, is what protects
  *    algebraic aggregates.
  *  - `salted sum`: [[SkewOps.saltedSum]] — same result, one extra
  *    shuffle; the explicit two-stage shape for engines/paths WITHOUT
  *    map-side combine.
  *  - `window, uniform keys` vs `window, skewed keys`: a per-key total
  *    read through `Window.partitionBy(key)` has NO partial
  *    aggregation — the hot key's 50 % of raw rows land in ONE task.
  *    Same rows, same plan, only the key distribution differs: the gap
  *    is the skew tax, the shape that melts at 100 TB and the reason
  *    the engine's family rule is "reduce cardinality BEFORE any
  *    window".
  *
  * Usage: runMain graft.tools.SkewStress
  */
object SkewStress {
  def t(l: String)(f: => Long): Double = {
    val t0 = System.nanoTime()
    val n = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"  $l: $sec%.2f s ($n rows)")
    sec
  }

  /** 50 % of rows on key 0, the rest uniform over 10⁶ cold keys. */
  def skewed(spark: org.apache.spark.sql.SparkSession, n: Long): DataFrame =
    spark.range(0, n, 1, 64).select(
      col("id"),
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(1000000L)) + 1L).as("key"),
      (col("id") % 1000).as("value"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    // warm-up
    skewed(spark, 100000).groupBy(col("key")).agg(sum(col("value"))).count()
    for (factor <- Seq(16, 64, 256)) {
      val n = factor * 1000000L
      // MATERIALIZE both inputs before timing: generation (range + hash
      // projections) would otherwise re-run inside every timed action and
      // differs in cost between the two distributions — the early version
      // of this tool timed exactly that confound instead of the shuffle
      val df = skewed(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      println(s"factor $factor ($n rows, key 0 = 50%):")
      val plain = t("plain groupBy sum")(
        df.groupBy(col("key")).agg(sum(col("value")).as("s")).count())
      val salted = t("salted sum (salt=32)")(
        SkewOps.saltedSum(df, "key", "value", salt = 32, sumName = "s").count())
      // equivalence (integral values → bit-exact)
      val a = df.groupBy(col("key")).agg(sum(col("value")).as("s"))
      val b = SkewOps.saltedSum(df, "key", "value", salt = 32, sumName = "s")
      require(a.except(b).isEmpty && b.except(a).isEmpty, "salted != plain")
      println(f"  parity plain/salted: ${plain / salted}%.2fx (partial agg already shields sums)")
      // the shape WITHOUT map-side combine: a window partitioned by key
      // ships every raw row of the hot key to ONE task. A running frame
      // ordered by a high-cardinality column forces a REAL in-partition
      // sort + per-row state update (an unbounded sum over a constant
      // key degenerates to a near-free single-pass — measured, not
      // assumed), so the hot task's cost scales with its row count.
      // Same rows, same plan, only the key distribution differs — the
      // gap IS the skew tax, and the hot task is the job's critical path.
      def runningRank(in: DataFrame) =
        in.withColumn("ord", xxhash64(col("key"), col("id")))
          .withColumn(
            "run",
            sum(col("value")).over(Window.partitionBy(col("key")).orderBy(col("ord"))
              .rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("key")).agg(max(col("run")).as("s")).count()
      val uniform = spark.range(0, n, 1, 64).select(
        col("id"),
        pmod(xxhash64(col("id")), lit(1000000L)).as("key"),
        (col("id") % 1000).as("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      uniform.count()
      val wUni = t("running-sum window, UNIFORM keys")(runningRank(uniform))
      val wSkew = t("running-sum window, SKEWED keys (hot=50%)")(runningRank(df))
      println(f"  window skew tax: ${wSkew / wUni}%.2fx " +
        "(no partial agg under a window -> the hot key's rows serialize in one task)")
      df.unpersist(blocking = true)
      uniform.unpersist(blocking = true)
    }
    spark.stop()
  }
}
