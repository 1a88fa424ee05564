package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F4 — mask filter. The reference *declares* an "optional mask layer"
  * (reference: setup.py:6; unused fixture test/test_histogram.py:6) but
  * ships no code path; this is the natural relational semantics: join the
  * value table with a boolean mask on the row key and keep masked-in rows.
  *
  * Scale: a mask aligned with the value table co-partitions on the join
  * key; when the mask is small (a region-of-interest) broadcast it. Both
  * plans avoid shuffling the (much larger) value side when it is already
  * hash-partitioned by key.
  */
object MaskOps {

  /** Keep rows whose key maps to `true` in the mask relation
    * `mask(key, mask: boolean)`. Missing keys are masked OUT (inner join) —
    * matching raster-mask semantics where nodata mask cells drop pixels.
    */
  def applyMask(values: DataFrame, mask: DataFrame, broadcastMask: Boolean = true): DataFrame = {
    val m = mask.filter(col("mask")).select(col("key"))
    values.join(if (broadcastMask) broadcast(m) else m, Seq("key"), "left_semi")
  }
}
