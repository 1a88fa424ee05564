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
  * Per-element update: increment a tracked key, insert while fewer than
  * k tracked, otherwise decrement ALL counters (dropping zeros). Merge
  * (Agarwal et al. 2012, "Mergeable Summaries" §3): counter-wise sum,
  * then subtract the (k+1)-th largest counter from every survivor and
  * drop non-positives — the summary stays ≤ k entries under ANY
  * reduce/merge tree.
  *
  * GUARANTEE (merge-order-independent): every key with true frequency
  * > n/(k+1) is present in the final summary, and each reported counter
  * underestimates the true count by at most n/(k+1). The COUNTERS
  * themselves depend on the merge order, so consumers must treat the
  * summary as a CANDIDATE SET and exact-verify before exposing counts —
  * [[graft.operators.SketchOps.heavyHittersMg]] does exactly that,
  * which is why its output is deterministic even though this buffer
  * is not (MgSpec pins both properties).
  */
class MisraGries(k: Int) extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
  require(k >= 1, "need at least one counter")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(st: Map[Long, Long], key: Long): Map[Long, Long] =
    st.get(key) match {
      case Some(c) => st.updated(key, c + 1L)
      case None if st.size < k => st.updated(key, 1L)
      case None =>
        // decrement-all: the classic MG step — drops any counter hitting 0
        st.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest counter; ties keep the summary ≤ k
      // because every counter ≤ the cut drops to ≤ 0
      val cut = summed.values.toArray.sortBy(-_).apply(k)
      summed.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(st: Map[Long, Long]): Seq[Long] = st.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
