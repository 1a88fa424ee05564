package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-delta (CDC-style) operators: given two versions of a keyed
  * table, classify every key as added / removed / changed / unchanged by
  * comparing row digests — the standard "what moved between crawls"
  * primitive of an incrementally-refreshed corpus.
  *
  * Scale shape: digests are md5 of the compared columns computed
  * MAP-SIDE, so the one full-outer shuffle moves (key, 16-byte digest)
  * rows, never the payload — at 100 TB the diff costs one co-partitioned
  * join of two key+digest streams. The digest input is serialized from
  * integer/string columns only (callers quantize floats first), so the
  * DuckDB oracle reproduces every digest bit-exactly.
  */
object DeltaOps {

  /** Row digest over the given (already integer/string-typed) columns. */
  def rowDigest(cols: Seq[Column]): Column = md5(concat_ws("|", cols: _*))

  /** Per-key diff of two snapshots. Output one row per status present:
    * `(status, n_keys, key_checksum)` — the checksum (sum of keys) pins
    * WHICH keys landed in each class, not just how many.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      digestCols: Seq[Column]): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("k"), rowDigest(digestCols).as("od"))
    val n = newSnap.select(col(keyCol).as("k"), rowDigest(digestCols).as("nd"))
    o.join(n, Seq("k"), "full_outer")
      .select(
        col("k"),
        when(col("od").isNull, lit("added"))
          .when(col("nd").isNull, lit("removed"))
          .when(col("od") =!= col("nd"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_keys"), sum(col("k")).as("key_checksum"))
      .orderBy(col("status"))
  }
}
