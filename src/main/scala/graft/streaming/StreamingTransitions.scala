package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the `events_transitions` Markov-matrix query: emit a
  * `(prev_type, event_type)` transition per event, chaining across
  * micro-batches through one tiny state record per user (the last seen
  * event — O(1) state, nothing like the per-group buffers a naive
  * window-over-stream would need).
  *
  * Ordering contract (same as `SessionOps.sessionizeStateful`): events for
  * one user arrive unsorted WITHIN a micro-batch (sorted here, bounded by
  * `maxEventsPerUserBatch`), but batches themselves advance in event-time —
  * an event older than a previous batch's last event would chain out of
  * order. At-least-once sources with bounded lateness get that via
  * watermarked reordering upstream; the StreamingSpec register asserts
  * stream == batch across a two-batch split.
  */
object StreamingTransitions {

  final case class TEv(user_id: Long, event_id: Long, ts_us: Long, event_type: String)
  final case class Last(ts_us: Long, event_id: Long, event_type: String)
  final case class Transition(user_id: Long, prev_type: String, event_type: String)

  def transitionsStateful(
      events: Dataset[TEv],
      maxEventsPerUserBatch: Int = 1 << 20): Dataset[Transition] = {
    implicit val stateEnc = Encoders.product[Last]
    implicit val outEnc = Encoders.product[Transition]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[TEv], state: GroupState[Last]) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[TEv]
          evs.foreach { e =>
            buf += e
            if (buf.length > maxEventsPerUserBatch)
              throw new IllegalStateException(
                s"user $uid has > $maxEventsPerUserBatch events in one micro-batch")
          }
          val sorted = buf.toArray
          java.util.Arrays.sort(sorted, Ordering.by((e: TEv) => (e.ts_us, e.event_id)))
          val out = Vector.newBuilder[Transition]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach(p => out += Transition(uid, p.event_type, e.event_type))
            prev = Some(Last(e.ts_us, e.event_id, e.event_type))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }
}
