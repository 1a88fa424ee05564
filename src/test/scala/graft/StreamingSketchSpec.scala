package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** The HLL register relation is a max-aggregation, so it runs unchanged as
  * a Structured Streaming stateful agg (bounded state: windows × 256
  * registers); the estimate finalizes at read time over the register sink —
  * the deployment shape for streaming approximate distincts.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sampleEvents: Seq[(Timestamp, Long)] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 600).map { i =>
      // ~3 events per user, users spread over 3 hours
      (new Timestamp(base + i * 18000L), (i % 211).toLong)
    }
  }

  test("streaming HLL registers == batch registers; finalized estimates equal") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val streamRegs = SketchOps.hllRegisters(
      input
        .toDF()
        .toDF("ts", "user_id")
        .withWatermark("ts", "30 minutes")
        .withColumn("hour", date_trunc("hour", col("ts"))),
      col("user_id"),
      Seq(col("hour")))
    val query = streamRegs.writeStream
      .format("memory")
      .queryName("stream_hll")
      .outputMode("complete")
      .start()
    try {
      input.addData(sampleEvents.take(300))
      query.processAllAvailable()
      input.addData(sampleEvents.drop(300))
      query.processAllAvailable()

      def finalize(regs: org.apache.spark.sql.DataFrame) =
        SketchOps
          .estimateFromRegisters(regs, Seq(col("hour")))
          .orderBy("hour")
          .collect()
          .map(r => (r.getTimestamp(0), r.getDouble(1)))
          .toSeq

      val streamed = finalize(spark.table("stream_hll"))
      val batch = finalize(
        SketchOps.hllRegisters(
          sampleEvents
            .toDF("ts", "user_id")
            .withColumn("hour", date_trunc("hour", col("ts"))),
          col("user_id"),
          Seq(col("hour"))))
      assert(streamed.nonEmpty)
      assert(streamed == batch, "incremental register state must equal the batch registers")
    } finally query.stop()
  }
  test("streaming CMS state == batch state; point estimates equal") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val streamState = SketchOps.cmsState(input.toDF().toDF("tok"), col("tok"))
    val query = streamState.writeStream
      .format("memory")
      .queryName("stream_cms")
      .outputMode("complete")
      .start()
    val words = (0 until 500).map(i => s"w${i % 37}")
    try {
      input.addData(words.take(200))
      query.processAllAvailable()
      input.addData(words.drop(200))
      query.processAllAvailable()
      val streamed = spark.table("stream_cms")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = SketchOps.cmsState(words.toDF("tok"), col("tok"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch, "CMS count state is a streaming-safe aggregation")
    } finally query.stop()
  }

  test("streaming Bloom set-bit state == batch state (bounded incremental build)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val streamState = SketchOps.bloomBits(input.toDF().toDF("k"))
    val query = streamState.writeStream
      .format("memory")
      .queryName("stream_bloom")
      .outputMode("complete")
      .start()
    val keys = (0 until 400).map(i => s"key${i % 137}")
    try {
      input.addData(keys.take(150))
      query.processAllAvailable()
      input.addData(keys.drop(150))
      query.processAllAvailable()
      val streamed = spark.table("stream_bloom")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = SketchOps.bloomBits(keys.toDF("k"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch, "Bloom bit state is a streaming-safe aggregation")
      assert(streamed.size <= 4096, "state bounded by m")
    } finally query.stop()
  }
}
