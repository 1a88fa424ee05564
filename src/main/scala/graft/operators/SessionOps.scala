package graft.operators

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over the `events` stream — the canonical
  * custom-state streaming operator (Structured Streaming
  * `flatMapGroupsWithState`), with an equivalent batch form expressed in
  * window functions (lag → gap flag → running sum = session id).
  *
  * Timestamps are int64 microseconds (`ts_us`) so gap arithmetic is exact
  * and oracle-reproducible (DuckDB truncates parquet nanos to TIMESTAMP(us),
  * so microseconds are the common precision).
  *
  * Scale: the batch form shuffles once on `user_id` (window partition), the
  * windows themselves are per-user (no global sort); the streaming form
  * keeps O(1) state per active user (start, last-seen, count).
  */
object SessionOps {

  final case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  final case class SessState(start_us: Long, last_us: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val stEnc: Encoder[SessState] = Encoders.product[SessState]
  implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Batch sessionization via window functions. Output one row per
    * (user, session): `(user_id, sess_id, n_events, start_us, end_us,
    * duration_us)` — all exact integers.
    */
  def sessionsBatch(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn(
        "new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > lit(gapUs), 1).otherwise(0))
      .withColumn(
        "sess_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .select(
        col("user_id"),
        col("sess_id"),
        col("n_events"),
        col("start_us"),
        col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  /** Custom-state form: runs identically over a batch Dataset or a stream
    * (Structured Streaming `flatMapGroupsWithState`).
    *
    * Emits a session when the gap closes it. `flushOpen = true` (batch use)
    * also emits the trailing open session of every user; in streaming,
    * leave it false — open sessions stay in the state store until a later
    * micro-batch closes them.
    *
    * Per-group memory: gap logic needs the micro-batch's events for one
    * user in timestamp order, and Spark hands them unsorted — a buffer of
    * the group is unavoidable, so it is BOUNDED and enforced:
    * `maxEventsPerUserBatch` (default 2²⁰) fails fast with a diagnostic
    * instead of letting one hot key (bot traffic) OOM an executor.
    * Mitigations at scale: shorter micro-batches, pre-filtering known bot
    * ids, or raising the cap where executors are sized for it. The buffer
    * is a single array sorted in place (no intermediate Seq copies).
    */
  def sessionizeStateful(
      events: Dataset[Ev],
      gapUs: Long,
      flushOpen: Boolean,
      maxEventsPerUserBatch: Int = 1 << 20): Dataset[SessionOut] =
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[Ev]
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
            Ordering.by((e: Ev) => (e.ts_us, e.event_id)))
          val out = ListBuffer.empty[SessionOut]
          var st = state.getOption
          sorted.foreach { e =>
            st match {
              case None =>
                st = Some(SessState(e.ts_us, e.ts_us, 1))
              case Some(s) if e.ts_us - s.last_us > gapUs =>
                out += SessionOut(uid, s.start_us, s.last_us, s.n)
                st = Some(SessState(e.ts_us, e.ts_us, 1))
              case Some(s) =>
                st = Some(s.copy(last_us = math.max(s.last_us, e.ts_us), n = s.n + 1))
            }
          }
          if (flushOpen) {
            st.foreach(s => out += SessionOut(uid, s.start_us, s.last_us, s.n))
            state.remove()
          } else {
            st.foreach(state.update)
          }
          out.iterator
      }
}
