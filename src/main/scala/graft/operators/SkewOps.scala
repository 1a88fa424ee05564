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

  /** Two-stage salted sum: groupBy(key + random-ish salt) partial sums,
    * then groupBy(key) final sums. The salt is derived from a hash of the
    * whole row's value column (deterministic — no RNG), which distributes
    * uniformly without breaking reproducibility.
    *
    * Equivalent to `df.groupBy(key).agg(sum(value))` for any input
    * (asserted in SkewSpec); use when one key carries a disproportionate
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
        pmod(xxhash64(col(valueCol)), lit(salt.toLong)).as("_salt"))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as(sumName))

  /** Salted (replicated-broadcast) join for a skewed fact against a small
    * dimension: the fact side gets a deterministic salt in [0, salt), the
    * dimension is exploded `salt`× with every salt value, and the join key
    * becomes (key, salt) — splitting each hot key's rows across `salt`
    * tasks. Only sensible when `dim` is small enough to replicate.
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
