package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-starvation predicate for size-routed plan shapes.
  *
  * A parquet scan parallelizes by input SPLIT, and a split cannot cut a
  * row group — so a relation that lands as one file with one row group
  * (exactly what a small bench table or an under-compacted landing table
  * looks like) feeds its whole stage to ONE task no matter how many cores
  * the session has. Any expensive per-row kernel fused into that stage
  * (md5 portable hashes, shingling, per-token text stats) then runs
  * single-threaded while the other cores idle (round-14 measurement:
  * profile_approx spent 1.3 s of its 1.7 s in one single-task stage on
  * local[32]).
  *
  * [[isStarved]] is the route condition for operator-specific escapes
  * from that stage shape (e.g. [[graft.operators.ProfileOps]]'
  * dedup-before-hash route). It is deliberately NOT a repartition
  * helper: a measured round-14 attempt to fix starvation generically
  * with `repartition(cores)` made the stage 10× SLOWER — Catalyst
  * pushes projections below a round-robin exchange (so the kernel ran
  * single-task anyway) and sort-before-repartition (SPARK-23207) added
  * a single-task whole-relation sort on top. The winning shapes move
  * the kernel to the reduce side of an exchange the operator already
  * needs.
  *
  * At production scale the same scan yields splits ≫ cores, the
  * condition is false, and callers keep their scale shape — no second
  * pass or extra shuffle over a 100 TB corpus, ever. A garbage-high
  * size estimate (filters inherit their child's sizeInBytes) errs
  * toward `false`, i.e. toward the scale shape.
  */
object Spread {

  /** Default starvation bound: ≤ 16 MiB of input per core. At local[32]
    * that is ≤ 512 MiB total — any exchange of (a projection of) the
    * relation is sub-second — while any relation a cluster would
    * struggle with sits orders of magnitude above it.
    */
  val DefaultMaxBytesPerCore: Long = 16L << 20

  /** Plan-time size of `rel` (Catalyst stats; parquet = file bytes). */
  def bytesOf(rel: DataFrame): BigInt =
    rel.queryExecution.optimizedPlan.stats.sizeInBytes

  /** True when `rel` is small enough that its scan cannot feed the
    * session's cores AND a re-spreading exchange is trivially cheap. */
  def isStarved(rel: DataFrame, maxBytesPerCore: Long = DefaultMaxBytesPerCore): Boolean = {
    val cores = rel.sparkSession.sparkContext.defaultParallelism
    cores > 1 && bytesOf(rel) <= BigInt(cores) * maxBytesPerCore
  }
}
