package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SessionOps
import graft.operators.SessionOps.{Ev, SessionOut}
import graft.sources.Tables

class SessionSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 1800000000L // 30 min

  test("golden: two sessions split at the gap") {
    val evs = Seq(
      Ev(1L, 1L, 0L),
      Ev(1L, 2L, 60_000_000L), // +1 min, same session
      Ev(1L, 3L, GapUs + 61_000_000L), // > 30 min after last → new session
      Ev(2L, 4L, 0L))
    val out = SessionOps.sessionsBatch(evs.toDF(), GapUs).collect()
    assert(out.length == 3)
    val u1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(u1.map(_.getLong(2)).toSeq == Seq(2L, 1L)) // n_events per session
    assert(u1.head.getLong(5) == 60_000_000L) // duration of first session
  }

  test("stateful (flushOpen) == batch window form on real events") {
    val events = Tables.events(spark, TestSpark.sf0001)
    val batch = SessionOps
      .sessionsBatch(events, GapUs)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val stateful = SessionOps
      .sessionizeStateful(
        events.select(col("user_id"), col("event_id"), col("ts_us")).as[Ev],
        GapUs,
        flushOpen = true)
      .collect()
      .map(s => (s.user_id, s.start_us, s.end_us, s.n_events))
      .toSet
    assert(stateful == batch)
    assert(batch.nonEmpty)
  }

  test("hot user: 200k-event group sessionizes; over-cap group fails fast") {
    // bot-traffic shape: one user, everything in one batch group
    val hot = (0 until 200000).map(i => Ev(9L, i.toLong, i.toLong * 1_000_000L))
    val out = SessionOps
      .sessionizeStateful(hot.toDS(), GapUs, flushOpen = true)
      .collect()
    assert(out.map(_.n_events).sum == 200000L)
    // enforced bound: a clear diagnostic instead of an executor OOM
    val e = intercept[org.apache.spark.SparkException] {
      SessionOps
        .sessionizeStateful(hot.take(200).toDS(), GapUs, flushOpen = true,
          maxEventsPerUserBatch = 100)
        .collect()
    }
    assert(e.getMessage.contains("maxEventsPerUserBatch") ||
      Option(e.getCause).exists(_.getMessage.contains("maxEventsPerUserBatch")))
  }

  test("streaming sessionization closes sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = SessionOps
      .sessionizeStateful(input.toDS(), GapUs, flushOpen = false)
      .writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode("append")
      .start()
    try {
      input.addData(Ev(7L, 1L, 0L), Ev(7L, 2L, 1_000_000L))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // still open
      input.addData(Ev(7L, 3L, GapUs + 2_000_000L)) // closes session 1
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[SessionOut].collect()
      assert(closed.toSeq == Seq(SessionOut(7L, 0L, 1_000_000L, 2L)))
    } finally q.stop()
  }
}
