package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the `events_debounce` query: pass an event through
  * only if it lands more than `gapUs` after the user's PREVIOUS event
  * (kept or not — a steady stream of sub-threshold retries stays
  * suppressed against the latest arrival, exactly the batch lag() rule).
  * State is one `(ts_us, event_id)` record per user — O(1), chained
  * across micro-batches.
  *
  * Same ordering contract as [[StreamingTransitions]]: events may arrive
  * unsorted within a micro-batch (sorted here, bounded), batches advance
  * in event time; the StreamingSpec register asserts stream == batch
  * across a mid-user batch split.
  */
object StreamingDebounce {

  final case class DEv(user_id: Long, event_id: Long, ts_us: Long, event_type: String)
  final case class LastSeen(ts_us: Long, event_id: Long)
  final case class Kept(user_id: Long, event_id: Long, ts_us: Long, event_type: String)

  def debounceStateful(
      events: Dataset[DEv],
      gapUs: Long,
      maxEventsPerUserBatch: Int = 1 << 20): Dataset[Kept] = {
    implicit val stateEnc = Encoders.product[LastSeen]
    implicit val outEnc = Encoders.product[Kept]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[DEv], state: GroupState[LastSeen]) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[DEv]
          evs.foreach { e =>
            buf += e
            if (buf.length > maxEventsPerUserBatch)
              throw new IllegalStateException(
                s"user $uid has > $maxEventsPerUserBatch events in one micro-batch")
          }
          val sorted = buf.toArray
          java.util.Arrays.sort(sorted, Ordering.by((e: DEv) => (e.ts_us, e.event_id)))
          val out = Vector.newBuilder[Kept]
          var prev = state.getOption
          sorted.foreach { e =>
            if (prev.forall(p => e.ts_us - p.ts_us > gapUs))
              out += Kept(uid, e.event_id, e.ts_us, e.event_type)
            prev = Some(LastSeen(e.ts_us, e.event_id))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }
}
