package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
object JProbe {
  def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"  $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    graft.operators.DedupOps.jaccardPairs(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"), 3, 0.5).count()
    graft.operators.DedupOps.releaseShingleCaches()
    val docs = spark.read.parquet(s"target/stress/docs_x$factor.parquet")
    val tokenized = docs.select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("tk")).persist(StorageLevel.MEMORY_AND_DISK)
    val sh = tokenized
      .select(col("doc_id"), graft.operators.DedupOps.shingles(col("tk"), 3).as("s0"))
      .select(col("doc_id"), size(col("s0")).as("nsh"), explode(col("s0")).as("s"))
      .select(col("doc_id"), col("nsh"), graft.functions.PortableHash.hash60(col("s")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("sh materialize")(println("  rows: " + sh.count()))
    val wdf = Window.partitionBy(col("h"))
    val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val prefix = sh.withColumn("df", count(lit(1)).over(wdf))
      .withColumn("rn", row_number().over(wdoc))
      .filter(col("rn") <= col("nsh") - ceil(lit(0.5) * col("nsh")) + lit(1))
      .select(col("doc_id"), col("nsh"), col("h")).persist(StorageLevel.MEMORY_AND_DISK)
    t("prefix materialize")(println("  rows: " + prefix.count()))
    val cand = prefix.toDF("a_id", "na", "h").join(prefix.toDF("b_id", "nb", "h"), Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .filter(least(col("na"), col("nb")).cast("double") >= (lit(0.5) - lit(1e-6)) * greatest(col("na"), col("nb")))
      .select(col("a_id"), col("b_id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("cand")(println("  cand rows: " + cand.count()))
    val a = sh.toDF("a_id", "na", "h"); val b = sh.toDF("b_id", "nb", "h")
    val out = cand.join(a, Seq("a_id")).join(b, Seq("b_id", "h"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"), min(col("na")).as("na"), min(col("nb")).as("nb"))
    t("verify smj")(out.count())
    val outH = cand.hint("SHUFFLE_HASH").join(a, Seq("a_id"))
      .join(b.hint("SHUFFLE_HASH"), Seq("b_id", "h"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"), min(col("na")).as("na"), min(col("nb")).as("nb"))
    t("verify shuffhash")(outH.count())
    t("verify shuffhash rep2")(outH.count())
    spark.stop()
  }
}
