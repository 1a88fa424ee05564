package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ClusterOps, DedupOps}

/** Scale-up stress for the triangle census: the sf0.1 co-occurrence graph
  * replicated 1×/2×/4× with node ids shifted per copy (disjoint copies —
  * triangles/wedges grow exactly linearly, so wall time should too), plus
  * a HUB variant that wires one node to 5 000 others. An unoriented wedge
  * enumeration would emit C(5000,2) ≈ 12.5 M wedges at the hub; the
  * degree-ordered orientation gives the hub outdegree ~0 (every edge
  * points toward the max-degree endpoint), so the hub variant should cost
  * about the same as the plain graph — that flatness is the measurement
  * backing the operator's 100 TB skew claim.
  *
  * Usage: runMain graft.tools.GraphScaleStress
  */
object GraphScaleStress {
  def t(l: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def baseEdges(spark: SparkSession): DataFrame = {
    val items = graft.sources.Tables
      .lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    items.as("a")
      .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= 2)
      .select(col("u"), col("v"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    val path = "target/stress/graph_edges.parquet"
    if (!new java.io.File(path).exists()) baseEdges(spark).write.parquet(path)
    val base = spark.read.parquet(path)
    val maxId = base.agg(greatest(max(col("u")), max(col("v")))).collect()(0).getLong(0) + 1
    // warm-up (codegen/JIT)
    ClusterOps.triangleCount(base.limit(100)).collect()
    DedupOps.releaseAllCaches()
    for (factor <- Seq(1, 2, 4)) {
      val g = (0 until factor)
        .map(c => base.select((col("u") + lit(c * maxId)).as("u"), (col("v") + lit(c * maxId)).as("v")))
        .reduce(_.union(_))
      t(s"triangles x$factor") {
        val r = ClusterOps.triangleCount(g).collect()(0)
        println(s"    edges=${r.getAs[Long]("n_edges")} wedges=${r.getAs[Long]("n_wedges")} " +
          s"triangles=${r.getAs[Long]("n_triangles")}")
      }
      DedupOps.releaseAllCaches()
    }
    // hub variant: one node wired to 5000 others on top of the base graph
    val hub = spark.range(5000)
      .select(lit(maxId * 10).as("u"), (col("id") * lit(7L) + lit(1L)).as("v"))
    val withHub = base.union(hub)
    t("triangles base+hub(5000)") {
      val r = ClusterOps.triangleCount(withHub).collect()(0)
      println(s"    edges=${r.getAs[Long]("n_edges")} wedges=${r.getAs[Long]("n_wedges")} " +
        s"triangles=${r.getAs[Long]("n_triangles")}")
    }
    DedupOps.releaseAllCaches()
    spark.stop()
  }
}
