package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeriesOps.ewmaLast]]: the
  * per-user truncated EWMA held live in O(lookback) state — the smoothed
  * gauge a monitoring dashboard tails, instead of re-running the batch
  * window over the full history each refresh.
  *
  * State per user: the newest `lookback` cents values (newest-first) plus
  * the event count — a bounded deque regardless of series length, the
  * same O(1)-per-row discipline as the batch window frame. Each
  * micro-batch emits one snapshot row per touched user; the LATEST
  * snapshot per user equals the batch readout exactly (same dyadic
  * integer num/den, one final IEEE division), under per-user event-time
  * order across micro-batches (within a batch, order is free — the group
  * buffer is sorted like StreamingFunnel). `StreamingEwmaSpec` pins the
  * equivalence.
  */
object StreamingEwma {

  final case class EwEv(user_id: Long, event_id: Long, ts_us: Long, cents: Long)
  final case class EwState(recent: Seq[Long], n: Long)
  final case class EwmaOut(user_id: Long, n_events: Long, last_cents: Long, ewma_cents: Double)

  implicit val evEnc: Encoder[EwEv] = Encoders.product[EwEv]
  implicit val stEnc: Encoder[EwState] = Encoders.product[EwState]
  implicit val outEnc: Encoder[EwmaOut] = Encoders.product[EwmaOut]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** The batch operator's readout off a newest-first recent-values list:
    * `num = Σ_j recent(j)·2^(K−1−j)`, `den = Σ_j 2^(K−1−j)`, one
    * division, rounded to 6 — shared by state snapshots and specs.
    */
  def ewmaOf(recent: Seq[Long], lookback: Int): Double = {
    var num = 0L
    var den = 0L
    var j = 0
    recent.foreach { c =>
      num += c << (lookback - 1 - j)
      den += 1L << (lookback - 1 - j)
      j += 1
    }
    BigDecimal(num.toDouble / den.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
  }

  /** One snapshot row per (user, micro-batch-with-events). Runs
    * identically over a batch Dataset or a stream.
    */
  def snapshots(
      events: Dataset[EwEv],
      lookback: Int = 8,
      maxEventsPerUserBatch: Int = 1 << 20): Dataset[EwmaOut] = {
    require(lookback >= 1 && lookback <= 62, "lookback must fit a Long shift")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[EwEv], state: GroupState[EwState]) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[EwEv]
          evs.foreach { e =>
            buf += e
            if (buf.length > maxEventsPerUserBatch)
              throw new IllegalStateException(
                s"user $uid has > $maxEventsPerUserBatch events in one micro-batch; " +
                  "raise maxEventsPerUserBatch or shorten the batch interval")
          }
          val sorted = buf.toArray
          java.util.Arrays.sort(sorted, Ordering.by((e: EwEv) => (e.ts_us, e.event_id)))
          var st = state.getOption.getOrElse(EwState(Seq.empty, 0L))
          sorted.foreach { e =>
            st = EwState((e.cents +: st.recent).take(lookback), st.n + 1)
          }
          state.update(st)
          if (sorted.isEmpty) Iterator.empty
          else
            Iterator.single(
              EwmaOut(uid, st.n, st.recent.head, ewmaOf(st.recent, lookback)))
      }
  }
}
