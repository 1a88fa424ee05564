package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.FunnelOps
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FEv

/** The streaming funnel twin against the batch machinery: under in-order
  * per-user event-time arrival, the set of completers and their stage
  * times equal `FunnelOps.stageTimes`' join exactly; each user completes
  * at most once across micro-batches; within-batch disorder is absorbed
  * by the group-buffer sort.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 1000L

  // synthetic staged journeys: some complete, some stall, some violate
  // the gap, some re-enter stage 1 before progressing
  private def sample(seed: Int, nUsers: Int): Seq[FEv] = {
    val r = new scala.util.Random(seed)
    var eid = 0L
    (1 to nUsers).flatMap { u =>
      val t0 = r.nextInt(1000).toLong
      val shape = r.nextInt(4)
      val evs = shape match {
        case 0 => // clean completion
          Seq((t0, 1), (t0 + 1 + r.nextInt(900), 2), (t0 + 1000 + r.nextInt(900), 3))
        case 1 => // stalls after click
          Seq((t0, 1), (t0 + 5, 2))
        case 2 => // purchase outside the gap
          Seq((t0, 1), (t0 + 5, 2), (t0 + 5 + Gap + 1 + r.nextInt(50), 3))
        case _ => // noise first, then completion
          Seq((t0, 2), (t0 + 1, 1), (t0 + 10, 2), (t0 + 20, 3))
      }
      evs.map { case (ts, st) => eid += 1; FEv(u.toLong, eid, ts, st) }
    }
  }

  private def batchCompleters(all: Seq[FEv]): Set[(Long, Seq[Long])] = {
    val df = all.toDF()
      .select(col("user_id"),
        when(col("stage") === 1, "view").when(col("stage") === 2, "click")
          .otherwise("purchase").as("event_type"),
        col("ts_us"))
    val st = FunnelOps.stageTimes(df, "user_id", "ts_us",
      Seq(col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"), maxGap = Gap)
    st(0).join(st(1), Seq("user_id")).join(st(2), Seq("user_id"))
      .collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("streaming completions across in-order micro-batches == batch stageTimes") {
    implicit val sqlCtx = spark.sqlContext
    val all = sample(21, 60).sortBy(e => (e.ts_us, e.event_id))
    val input = MemoryStream[FEv]
    val query = StreamingFunnel.completions(input.toDS(), k = 3, maxGap = Gap)
      .writeStream.format("memory").queryName("sfun_out")
      .outputMode("append").start()
    try {
      all.grouped(math.max(1, all.size / 4)).foreach { b =>
        input.addData(b); query.processAllAvailable()
      }
      val got = spark.table("sfun_out").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toSet
      val want = batchCompleters(all)
      assert(got == want, s"stream $got vs batch $want")
      assert(got.map(_._1).size == got.size, "at most one completion per user")
    } finally query.stop()
  }

  test("within-batch disorder is absorbed by the group-buffer sort") {
    implicit val sqlCtx = spark.sqlContext
    val user = Seq(FEv(1L, 3L, 300L, 3), FEv(1L, 1L, 100L, 1), FEv(1L, 2L, 200L, 2))
    val input = MemoryStream[FEv]
    val query = StreamingFunnel.completions(input.toDS(), k = 3, maxGap = Gap)
      .writeStream.format("memory").queryName("sfun_out2")
      .outputMode("append").start()
    try {
      input.addData(user); query.processAllAvailable()
      val got = spark.table("sfun_out2").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toSeq
      assert(got == Seq(1L -> Seq(100L, 200L, 300L)))
    } finally query.stop()
  }
}
