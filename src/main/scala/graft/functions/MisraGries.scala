package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries bounded frequency summary over 64-bit keys (Misra & Gries
  * 1982), as a typed Spark `Aggregator` so the candidate pass is ONE
  * map-side-combinable aggregation with ≤ k counters of state per task —
  * the deterministic-guarantee sibling of the sampled candidate
  * generator ([[graft.operators.SketchOps.heavyHittersSampled]]) and of
  * the CMS point sketch ([[graft.operators.SketchOps.cmsState]], which
  * cannot enumerate its keys).
  *
  * State is `(base, counts)` where every stored entry is alive
  * (`count > base` — enforced on all paths) — the DEBT-COUNTER form:
  * the classic "decrement every counter" step on a non-tracked element
  * is ONE `base += 1` (with an immediate sweep of newly-dead entries)
  * instead of an O(k) rebuild on every cold element. Each sweep consumes
  * ≥ k increment-credits (every alive entry's excess drops by 1), and
  * credits only enter via increments/insertions, so total sweep work is
  * O(n/k · k) = O(n): amortized O(1) per element — the constant a
  * 100 TB token stream actually meets, where the naive rebuild pays
  * O(k) on every cold token. Effective counts are IDENTICAL to the
  * textbook formulation (MgSpec replays both properties).
  *
  * Merge (Agarwal et al. 2012, "Mergeable Summaries" §3): sum the two
  * sides' effective counts, then subtract the (k+1)-th largest from
  * every survivor and drop non-positives — the summary stays ≤ k
  * entries under ANY reduce/merge tree.
  *
  * GUARANTEE (merge-order-independent): every key with true frequency
  * > n/(k+1) is present in the final summary, and each effective
  * counter underestimates the true count by at most n/(k+1). The
  * counters themselves depend on the merge order, so consumers must
  * treat the summary as a CANDIDATE SET and exact-verify before
  * exposing counts — [[graft.operators.SketchOps.heavyHittersMg]] does
  * exactly that, which is why its output is deterministic even though
  * this buffer is not (MgSpec pins both properties).
  */
class MisraGries(k: Int)
    extends Aggregator[Long, (Long, Long, Map[Long, Long]), (Long, Seq[Long])] {
  require(k >= 1, "need at least one counter")

  // Buffer is (n, base, counts): n is the TOTAL element count — itself a
  // trivially mergeable sum, carried so one aggregation pass yields both
  // the candidate set and the n that defines its > n/(k+1) guarantee
  // (round-12 advice: heavyHittersMg previously paid a third scan for n).
  override def zero: (Long, Long, Map[Long, Long]) = (0L, 0L, Map.empty)

  /** Effective (textbook-MG) counts of a buffer — alive keys only. */
  def effective(st: (Long, Long, Map[Long, Long])): Map[Long, Long] = {
    val (_, base, m) = st
    m.collect { case (t, c) if c > base => t -> (c - base) }
  }

  override def reduce(
      st: (Long, Long, Map[Long, Long]), key: Long): (Long, Long, Map[Long, Long]) = {
    // invariant: every stored entry is ALIVE (c > base) — insertions
    // store base+1, the base step sweeps immediately, and merge re-bases
    // at 0 with positive counts only
    val (n, base, m) = st
    m.get(key) match {
      case Some(c) => (n + 1L, base, m.updated(key, c + 1L))
      case None if m.size < k => (n + 1L, base, m.updated(key, base + 1L))
      case None =>
        // k tracked, all alive: one base step ≡ decrement-all; sweep
        // newly-dead entries now (amortized by the credits the sweep
        // consumes — see scaladoc)
        val nb = base + 1L
        (n + 1L, nb, m.filter { case (_, c) => c > nb })
    }
  }

  override def merge(
      a: (Long, Long, Map[Long, Long]),
      b: (Long, Long, Map[Long, Long])): (Long, Long, Map[Long, Long]) = {
    val ea = effective(a)
    val summed = effective(b).foldLeft(ea) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    val n = a._1 + b._1
    if (summed.size <= k) (n, 0L, summed)
    else {
      // subtract the (k+1)-th largest counter; ties keep the summary ≤ k
      // because every counter ≤ the cut drops to ≤ 0
      val cut = summed.values.toArray.sortBy(-_).apply(k)
      (n, 0L, summed.collect { case (t, c) if c > cut => t -> (c - cut) })
    }
  }

  /** `(n_total, sorted candidate keys)`. */
  override def finish(st: (Long, Long, Map[Long, Long])): (Long, Seq[Long]) =
    (st._1, effective(st).keys.toSeq.sorted)

  override def bufferEncoder: Encoder[(Long, Long, Map[Long, Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Map[Long, Long])]()

  override def outputEncoder: Encoder[(Long, Seq[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long])]()
}
