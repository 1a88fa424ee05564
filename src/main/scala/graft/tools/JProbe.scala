package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object JProbe {
  def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"  $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    // JIT/codegen warmup
    graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, "/root/testdata/sf0.001").count()
    graft.operators.DedupOps.releaseShingleCaches()
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val tokenized = docs.select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("tk")).persist(StorageLevel.MEMORY_AND_DISK)
    val base = tokenized
      .select(col("doc_id"), graft.operators.DedupOps.shingles(col("tk"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))
    val shStr = base.persist(StorageLevel.MEMORY_AND_DISK)
    t("explode strings")(shStr.count())
    val shH60 = base.select(col("doc_id"), col("nsh"), graft.functions.PortableHash.hash60(col("s")).as("h")).persist(StorageLevel.MEMORY_AND_DISK)
    t("explode + hash60")(shH60.count())
    val shXx = base.select(col("doc_id"), col("nsh"), xxhash64(col("s")).as("h")).persist(StorageLevel.MEMORY_AND_DISK)
    t("explode + xxhash64")(shXx.count())
    import org.apache.spark.sql.expressions.Window
    for ((lbl, sh) <- Seq(("h60", shH60), ("xx", shXx))) {
      val wdf = Window.partitionBy(col("h"))
      val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      val prefix = sh.withColumn("df", count(lit(1)).over(wdf))
        .withColumn("rn", row_number().over(wdoc))
        .filter(col("rn") <= col("nsh") - ceil(lit(0.5) * col("nsh")) + lit(1))
        .select(col("doc_id"), col("nsh"), col("h")).persist(StorageLevel.MEMORY_AND_DISK)
      t(s"$lbl prefix")(prefix.count())
      val cand = prefix.toDF("a_id", "na", "h").join(prefix.toDF("b_id", "nb", "h"), Seq("h"))
        .filter(col("a_id") < col("b_id"))
        .filter(least(col("na"), col("nb")).cast("double") >= (lit(0.5) - lit(1e-6)) * greatest(col("na"), col("nb")))
        .select(col("a_id"), col("b_id")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      t(s"$lbl cand")(println("  cand rows: " + cand.count()))
      val a = sh.toDF("a_id", "na", "h"); val b = sh.toDF("b_id", "nb", "h")
      val out = cand.join(a, Seq("a_id")).join(b, Seq("b_id", "h"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("inter"), min(col("na")).as("na"), min(col("nb")).as("nb"))
      t(s"$lbl verify")(out.count())
      prefix.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
