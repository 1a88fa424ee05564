package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.FunnelOps.stageTimes]]: track each
  * user's staged progress (view → click → purchase within per-step
  * `maxGap`) in O(stages) state per user and emit one completion record
  * the moment the final stage lands — the live funnel a growth dashboard
  * tails, instead of re-running the batch join chain.
  *
  * Exactness contract: equal to the batch `stageTimes` completers when
  * events arrive in per-user EVENT-TIME order across micro-batches (the
  * watermarked-ingest case; within a micro-batch order is free — the
  * group buffer is sorted like
  * [[graft.operators.SessionOps.sessionizeStateful]]). Under in-order
  * arrival the first eligible stage-s event IS the batch form's
  * min-eligible, so the recorded times match exactly —
  * `StreamingFunnelSpec` pins the equivalence. Out-of-order arrival
  * degrades gracefully (a funnel is recognized with possibly-later stage
  * times, never a phantom one): exactness there would require buffering
  * every candidate stage event per user, unbounded state for a
  * monitoring gauge.
  *
  * State per user: reached stage times (≤ `k` longs) + a done flag;
  * completed users keep a tombstone so re-emission is impossible.
  */
object StreamingFunnel {

  final case class FEv(user_id: Long, event_id: Long, ts_us: Long, stage: Int)
  final case class FState(times: Seq[Long], done: Boolean)
  final case class FunnelOut(user_id: Long, stage_ts: Seq[Long])

  implicit val evEnc: Encoder[FEv] = Encoders.product[FEv]
  implicit val stEnc: Encoder[FState] = Encoders.product[FState]
  implicit val outEnc: Encoder[FunnelOut] = Encoders.product[FunnelOut]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** One completion row per user who reaches stage `k`; `events` carries
    * a 1-based `stage` index (pre-mapped from event_type, irrelevant
    * events filtered upstream). Runs identically over a batch Dataset or
    * a stream.
    */
  def completions(
      events: Dataset[FEv],
      k: Int,
      maxGap: Long,
      maxEventsPerUserBatch: Int = 1 << 20): Dataset[FunnelOut] =
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[FEv], state: GroupState[FState]) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[FEv]
          evs.foreach { e =>
            buf += e
            if (buf.length > maxEventsPerUserBatch)
              throw new IllegalStateException(
                s"user $uid has > $maxEventsPerUserBatch events in one micro-batch; " +
                  "raise maxEventsPerUserBatch or shorten the batch interval")
          }
          val sorted = buf.toArray
          java.util.Arrays.sort(
            sorted,
            Ordering.by((e: FEv) => (e.ts_us, e.event_id)))
          var st = state.getOption.getOrElse(FState(Seq.empty, done = false))
          val out = ListBuffer.empty[FunnelOut]
          sorted.foreach { e =>
            if (!st.done) {
              val reached = st.times.length
              if (e.stage == 1 && reached == 0)
                st = st.copy(times = Seq(e.ts_us))
              else if (reached >= 1 && e.stage == reached + 1) {
                val prev = st.times.last
                if (e.ts_us > prev && e.ts_us <= prev + maxGap)
                  st = st.copy(times = st.times :+ e.ts_us)
              }
              if (st.times.length == k) {
                out += FunnelOut(uid, st.times)
                st = st.copy(done = true)
              }
            }
          }
          state.update(st)
          out.iterator
      }
}
