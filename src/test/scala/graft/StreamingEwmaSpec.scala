package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps
import graft.streaming.StreamingEwma
import graft.streaming.StreamingEwma.EwEv

/** The streaming EWMA twin against the batch window: under in-order
  * per-user arrival across micro-batches, each user's LATEST snapshot
  * equals `TimeSeriesOps.ewmaLast` row-for-row (n, last value, rounded
  * ewma); state stays bounded at `lookback` values; within-batch disorder
  * is absorbed by the group-buffer sort.
  */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  // (stream event, raw value): the stream carries cents derived by the
  // SAME truncation the batch operator applies (`(v*100).toLong` ==
  // non-ANSI CAST), so both paths see identical integers.
  private def sample(seed: Int, nUsers: Int, perUser: Int): Seq[(EwEv, Double)] = {
    val r = new scala.util.Random(seed)
    var eid = 0L
    (1 to nUsers).flatMap { u =>
      (1 to perUser).map { i =>
        eid += 1
        val v = (r.nextInt(100000) - 20000).toDouble / 100.0 + r.nextDouble() / 100.0
        (EwEv(u.toLong, eid, i.toLong * 100 + r.nextInt(50), (v * 100.0).toLong), v)
      }
    }
  }

  private def batchReadout(all: Seq[(EwEv, Double)]): Map[Long, (Long, Long, Double)] =
    TimeSeriesOps
      .ewmaLast(
        all.map { case (e, v) => (e.user_id, e.event_id, e.ts_us, v) }
          .toDF("user_id", "event_id", "ts_us", "value")
          .withColumn("ts", timestamp_micros(col("ts_us"))))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("latest stream snapshot per user == batch ewmaLast across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val all = sample(7, 40, 15).sortBy { case (e, _) => (e.ts_us, e.event_id) }
    val input = MemoryStream[EwEv]
    val query = StreamingEwma.snapshots(input.toDS())
      .writeStream.format("memory").queryName("sewma_out")
      .outputMode("append").start()
    try {
      all.map(_._1).grouped(math.max(1, all.size / 5)).foreach { b =>
        input.addData(b); query.processAllAvailable()
      }
      // latest snapshot per user = the one with the highest n_events
      val got = spark.table("sewma_out").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).map { case (u, snaps) => u -> snaps.map(_._2).maxBy(_._1) }
      val want = batchReadout(all)
      assert(got.keySet == want.keySet)
      got.foreach { case (u, s) => assert(s == want(u), s"user $u: $s vs ${want(u)}") }
    } finally query.stop()
  }

  test("cents fidelity: both paths share the truncating cast, negatives included") {
    val vals = Seq(-199.99, -0.004, 12.345)
    val evs = vals.zipWithIndex.map { case (v, i) =>
      (EwEv(1L, i.toLong + 1, (i.toLong + 1) * 100, (v * 100.0).toLong), v)
    }
    val want = batchReadout(evs)(1L)
    assert(want._1 == 3L)
    assert(want._2 == (12.345 * 100.0).toLong) // 1234, truncated like the cast
  }

  test("within-batch disorder is absorbed; state bounded at lookback") {
    implicit val sqlCtx = spark.sqlContext
    val evs = (1 to 30).reverse.map(i => EwEv(1L, i.toLong, i.toLong * 10, i.toLong * 100))
    val input = MemoryStream[EwEv]
    val query = StreamingEwma.snapshots(input.toDS(), lookback = 4)
      .writeStream.format("memory").queryName("sewma_out2")
      .outputMode("append").start()
    try {
      input.addData(evs); query.processAllAvailable()
      val got = spark.table("sewma_out2").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.length == 1)
      val (n, last, ewma) = got.head
      assert(n == 30 && last == 3000L)
      // newest-first 3000, 2900, 2800, 2700 with weights 8,4,2,1
      val expect = (3000L * 8 + 2900L * 4 + 2800L * 2 + 2700L).toDouble / 15.0
      assert(math.abs(ewma - expect) < 1e-6)
    } finally query.stop()
  }
}
