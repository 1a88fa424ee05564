package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key aggregation and joins at cluster
  * scale.
  *
  * AQE (`spark.sql.adaptive.skewJoin`) handles skewed *joins* at runtime;
  * skewed *aggregations* with driver-visible hot keys still benefit from
  * explicit two-stage salting: shard each hot key across `salt` partial
  * groups, then combine. Both stages are hash aggregations with map-side
  * combine, so the win is spreading a single hot reduce key over `salt`
  * reducers.
  */
object SkewOps {

  /** Two-stage salted sum: groupBy(key + salt) partial sums, then
    * groupBy(key) final sums. The salt comes from the row's position
    * (`monotonically_increasing_id`), not its value — a hot key whose rows
    * all share one value (the common skew case) must still spread across
    * all `salt` shards. The final sum is position-independent, so the
    * result is deterministic even though row ids aren't stable across
    * repartitionings.
    *
    * Exactly equivalent to `df.groupBy(key).agg(sum(value))` for integral
    * and decimal value columns (asserted in SkewSpec on integer data). For
    * floating-point values the two-stage shape changes the ADDITION ORDER,
    * so results may differ in the low bits — same caveat as any Spark
    * re-partitioning of a double sum; sum money as scaled longs/decimals if
    * bit-stability matters. Use when one key carries a disproportionate
    * share of rows.
    */
  def saltedSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salt: Int,
      sumName: String = "sum"): DataFrame =
    df.select(
        col(keyCol),
        col(valueCol),
        pmod(monotonically_increasing_id(), lit(salt.toLong)).as("_salt"))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as(sumName))

  /** Salted (replicated-broadcast) join for a skewed fact against a small
    * dimension: the fact side gets a deterministic salt in [0, salt), the
    * dimension is exploded `salt`× with every salt value, and the join key
    * becomes (key, salt) — splitting each hot key's rows across `salt`
    * tasks. Only sensible when `dim` is small enough to replicate.
    *
    * Determinism: the position-derived salt only selects WHICH of `salt`
    * identical dim replicas a fact row meets, so the joined output (after
    * `_salt` drops) is the same multiset as the unsalted join under any
    * repartitioning — row ids being unstable across layouts cannot reach
    * the result (pinned in SkewSpec).
    */
  def saltedBroadcastJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
    val replicatedDim = dim.withColumn("_salt", explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedFact.join(broadcast(replicatedDim), Seq(key, "_salt")).drop("_salt")
  }
}
