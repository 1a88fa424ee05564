package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the most recent
  * right row with `ts ≤ left.ts` for the same key — the
  * state-enrichment/backward-asof shape (trades↔quotes, event↔last-config).
  *
  * Built by composing existing operators (the preference-order (a) path —
  * no custom SparkPlan needed): union both sides tagged, one window pass
  * per key ordered by (ts, side) carrying the last right payload forward
  * (`last(_, ignoreNulls = true)`), keep left rows. Cost: ONE shuffle on
  * the key — the same as any sort-merge formulation and strictly better
  * than the naive inequality join, which Spark would plan as a quadratic
  * broadcast-nested-loop.
  *
  * Ties (right.ts == left.ts) count as "already happened": the right side
  * sorts before the left at equal ts.
  */
object AsOfOps {

  /** `left(key, ts, ...)` ⟕asof `right(key, ts, rightVal)` →
    * left columns + `rightVal` (null when no prior right row exists).
    * `tsCol` must be a numeric/orderable column present in both inputs;
    * `valCol` is the right payload to carry.
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(1)).withColumn(valCol, lit(null).cast(right.schema(valCol).dataType))
    val r = right
      .select(col(keyCol), col(tsCol), col(valCol))
      .withColumn("__side", lit(0))
    val unioned = l
      .select((Seq(col(keyCol), col(tsCol), col("__side"), col(valCol)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    // valCol as the final sort key: among right rows sharing (key, ts) the
    // carried value is then deterministic (left rows have null valCol and
    // are already separated by __side, so null-ordering never matters)
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__carried", last(col(valCol), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", valCol)
      .withColumnRenamed("__carried", valCol)
  }
}
