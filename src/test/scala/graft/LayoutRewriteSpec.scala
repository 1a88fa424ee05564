package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.LayoutOps
import graft.sources.Tables

/** End-to-end proof that [[LayoutOps.zOrderLayout]] buys what
  * [[LayoutOps.zoneSkipping]] predicts: the same relation written in
  * natural (orderkey) order and in Z order, read back through Spark's own
  * parquet scan with a 2-D box predicate — the Z layout's footer stats
  * let row-group pruning drop most of the data BEFORE it reaches the
  * engine, the natural layout's cannot. Measured from the
  * FileSourceScanExec's own `numOutputRows` metric (rows surviving pushed
  * row-group pruning), not from a simulation.
  */
class LayoutRewriteSpec extends SparkSpec {

  /** Rows emitted by the parquet SCAN node (post row-group pruning,
    * pre final filter) for a count over `df`.
    */
  private def scanRows(df: DataFrame): Long = {
    df.queryExecution.toRdd.count() // execute: metrics fill
    df.queryExecution.executedPlan
      .collectLeaves()
      .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .sum
  }

  test("z-ordered parquet prunes row groups for a 2-D box; natural layout cannot") {
    val li = Tables
      .lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // small row groups so each file holds several prunable groups even at
    // test scale (parquet.block.size is bytes; 16 KiB ≈ tens of groups)
    val wopts = Map("parquet.block.size" -> (16 * 1024).toString)

    // natural layout: ingest (orderkey) order — partkey/suppkey footer
    // ranges are corpus-wide in every row group
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.options(wopts).mode("overwrite").parquet(s"$dir/natural")
    // the rewrite under test
    LayoutOps
      .zOrderLayout(li, "l_partkey", "l_suppkey", 8)
      .write.options(wopts).mode("overwrite").parquet(s"$dir/zorder")

    // a 2-D box: selective in BOTH interleaved dimensions
    def boxed(path: String): DataFrame =
      spark.read.parquet(path).filter(
        col("l_partkey").between(100, 300) && col("l_suppkey").between(10, 40))

    val nat = boxed(s"$dir/natural")
    val zord = boxed(s"$dir/zorder")
    // same answer from both layouts
    val natRows = nat.count()
    assert(natRows > 0 && natRows == zord.count(), "layouts must agree on the result")

    val natScan = scanRows(nat)
    val zScan = scanRows(zord)
    val total = li.count()
    info(s"box rows=$natRows; scan emitted: natural=$natScan z=$zScan of $total total")
    // natural layout: every row group spans the whole partkey domain, so
    // pruning keeps (nearly) everything
    assert(natScan > total / 2, s"natural layout unexpectedly pruned: $natScan of $total")
    // z layout: the box touches a minority of z-ranges — the scan itself
    // must emit a small fraction of the corpus
    assert(zScan * 4 <= natScan,
      s"z-order row-group pruning too weak: scan emitted $zScan vs natural $natScan")
  }
}
