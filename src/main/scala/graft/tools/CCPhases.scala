package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.DedupOps

/** Per-round timing of connectedComponents over the jaccard pair graph,
  * comparing all-nodes gen0 vs edge-touched-only gen0.
  * Usage: runMain graft.tools.CCPhases [sfDir]
  */
object CCPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    val docs = graft.sources.Tables.documents(spark, sfDir)

    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm
    graft.operators.ClusterOps
      .nearDupClusters(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"), 3, 0.5)
      .count()
    DedupOps.releaseAllCaches()

    val edges = DedupOps.jaccardPairs(docs, 3, 0.5).select(col("a_id"), col("b_id"))
    t("pair fill")(edges.count())

    for (mode <- Seq("touched", "all")) {
      println(s"mode=$mode")
      val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
      val sym = e
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(e.select(col("b_id").as("src"), col("a_id").as("dst")))
      val nodes = docs.select(col("doc_id").as("id"))
      var labels = (if (mode == "touched")
        sym.select(col("src").as("id")).distinct().select(col("id"), col("id").as("lbl"))
      else nodes.select(col("id"), col("id").as("lbl")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("gen0 fill")(labels.count())
      var iter = 0
      var changed = 1L
      while (changed > 0 && iter < 50) {
        val nbrMin = sym
          .join(labels.select(col("id").as("src"), col("lbl")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(min(col("lbl")).as("nlbl"))
        val next = labels
          .join(nbrMin, Seq("id"), "left")
          .select(
            col("id"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
            col("lbl").as("prev"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        changed = t(s"round $iter")(next.filter(col("lbl") =!= col("prev")).count())
        println(s"    changed=$changed")
        labels.unpersist(blocking = false)
        labels = next
        iter += 1
      }
      val out =
        if (mode == "touched")
          nodes.join(labels, Seq("id"), "left")
            .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster_id"))
        else labels.select(col("id"), col("lbl").as("cluster_id"))
      t("final join+sort+count")(out.orderBy(col("id")).count())
      labels.unpersist(blocking = true)
      e.unpersist(blocking = true)
    }
    spark.stop()
  }
}
