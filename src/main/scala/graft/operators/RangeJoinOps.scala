package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match points to the intervals that
  * contain them. Spark plans the naive `p.ts BETWEEN i.lo AND i.hi`
  * condition as a broadcast-nested-loop join — O(points × intervals).
  *
  * This operator buckets both sides on a coarse grid of width `bucketWidth`
  * (each interval explodes into the buckets it overlaps; each point lands
  * in one bucket), turning the join into an equi-join on bucket id plus a
  * residual range filter — O(points + intervals × avgSpan/width) join
  * input, shuffled by bucket. Pick `bucketWidth` near the typical interval
  * length so intervals explode into O(1) buckets.
  */
object RangeJoinOps {

  /** `points(ptCol, ...)` ⋈ `intervals(loCol, hiCol, ...)` on
    * `lo ≤ pt ≤ hi` (inclusive both ends). All three columns must be
    * LongType; other column names must not collide.
    */
  def joinPointsToIntervals(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    // integer DIV, not double division: monotone for negatives (truncation
    // toward zero) and exact for the full long range
    val p = points.withColumn("__bucket", expr(s"$ptCol DIV $bucketWidth"))
    val i = intervals.withColumn(
      "__bucket",
      explode(sequence(expr(s"$loCol DIV $bucketWidth"), expr(s"$hiCol DIV $bucketWidth"))))
    p.join(i, Seq("__bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bucket")
  }
}
