package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Batch sinks beyond the reference's CSV (SURVEY §2.1): the layout step
  * that makes a curated corpus *consumable* at scale.
  *
  * `writePartitionedSorted` emits hive-style partition directories
  * (`part=<value>/`) with rows sorted inside every file:
  *  - partition directories give downstream readers free partition
  *    pruning (a `WHERE lang = 'en'` never opens other directories);
  *  - the in-file sort gives parquet tight min/max column statistics on
  *    the sort key, so row-group pruning works for range predicates;
  *  - `repartition(partition cols)` before the write makes each task own
  *    whole partition values — without it, every task writes a file into
  *    every partition directory and the output explodes into
  *    tasks × partitions tiny files (the classic small-files failure).
  *
  * At 100 TB the same call shape holds; you'd additionally bound file
  * size via `spark.sql.files.maxRecordsPerFile`.
  */
object Sinks {

  def writePartitionedSorted(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
}
