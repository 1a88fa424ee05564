package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming A/B experiment monitor — the incremental twin of the batch
  * `ab_test` query (EventsQueries): per-variant sufficient statistics
  * `(n, Σcents, Σcents²)` under a deterministic user split.
  *
  * The state IS the sufficient statistic: three associative/commutative
  * integer sums per variant, so Structured Streaming folds each
  * micro-batch into O(variants) state rows with no history re-read —
  * the same bounded-state argument as StreamingHistogram. The z-score
  * itself is a FINISHING projection over the 2-row output (a division
  * is not incremental); batch and stream share it via [[withZ]], so the
  * readout is bit-identical to the batch oracle's arithmetic.
  */
object StreamingAbTest {

  /** Per-variant `(variant, n, s, q)` — runnable identically on a batch
    * or streaming `events(user_id: long, value: double)` input.
    */
  def variantStats(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull && !isnan(col("value")))
      .select(
        pmod(col("user_id"), lit(2L)).as("variant"),
        (col("value") * lit(100.0)).cast("bigint").as("c"))
      .groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))

  /** Welch z finishing projection over the collected 2-row stats —
    * identical expression order to the `ab_test` oracle.
    */
  def withZ(statsA: (Long, Long, Long), statsB: (Long, Long, Long)): Double = {
    val (na, sa, qa) = statsA
    val (nb, sb, qb) = statsB
    val va = (qa.toDouble - sa.toDouble * sa.toDouble / na.toDouble) / (na.toDouble - 1.0)
    val vb = (qb.toDouble - sb.toDouble * sb.toDouble / nb.toDouble) / (nb.toDouble - 1.0)
    (sa.toDouble / na.toDouble - sb.toDouble / nb.toDouble) /
      math.sqrt(va / na.toDouble + vb / nb.toDouble)
  }
}
