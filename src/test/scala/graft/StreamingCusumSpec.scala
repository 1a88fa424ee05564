package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingCusum

/** The streaming CUSUM twin against the batch machinery:
  *
  *  1. the per-period sum state after N micro-batches equals the batch
  *     aggregation over the union (keyed sums are order-insensitive);
  *  2. the changepoint read from the streaming state equals
  *     `EvalOps.cusumChangepoint` on the same rows (shared readout);
  *  3. an injected level shift is located at its true boundary.
  */
class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._

  // per-event (day, cents) with a mean step at day > 20
  private def sample(seed: Int, n: Int): Seq[(Int, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n) {
      val k = r.nextInt(40) + 1
      val base = if (k > 20) 5000L else 1000L
      (k, base + r.nextInt(200))
    }
  }

  test("streaming period state across micro-batches == batch state; readout agrees") {
    implicit val sqlCtx = spark.sqlContext
    val all = sample(7, 900)
    val input = MemoryStream[(Int, Long)]
    val stream = StreamingCusum.periodSums(input.toDF().toDF("k", "x"))
    val query = stream.writeStream
      .format("memory").queryName("scusum_state").outputMode("complete").start()
    try {
      input.addData(all.take(300)); query.processAllAvailable()
      input.addData(all.slice(300, 600)); query.processAllAvailable()
      input.addData(all.drop(600)); query.processAllAvailable()
      val streamState = spark.table("scusum_state")
      val batchState = StreamingCusum.periodSums(all.toDF("k", "x"))
      assert(
        streamState.except(batchState).isEmpty && batchState.except(streamState).isEmpty,
        "incremental state must equal the batch aggregation")
      val sr = StreamingCusum.changepointFromState(streamState).head()
      val br = graft.operators.EvalOps
        .cusumChangepoint(all.toDF("k", "x"), col("k"), col("x")).head()
      assert(sr == br, "changepoint readout is a pure function of the state")
      assert(sr.getInt(1) == 20, s"shift injected at day 20, located ${sr.getInt(1)}")
      assert(sr.getDouble(6) > 0.0, "positive level shift must read positive")
      val sa = StreamingCusum.acfFromState(streamState, 3).collect().toSeq
      val ba = graft.operators.EvalOps
        .integerAcf(all.toDF("k", "x"), col("k"), col("x"), 3).collect().toSeq
      assert(sa == ba, "ACF readout off the same state equals the batch operator")
    } finally query.stop()
  }

  test("state merged from two disjoint half-streams == state of the union") {
    val all = sample(8, 400)
    val (h1, h2) = all.splitAt(200)
    val merged = StreamingCusum.periodSums(
      StreamingCusum.periodSums(h1.toDF("k", "x"))
        .union(StreamingCusum.periodSums(h2.toDF("k", "x")))
        .select(col("k"), col("xs").as("x")))
    val direct = StreamingCusum.periodSums(all.toDF("k", "x"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
    assert(StreamingCusum.changepointFromState(merged).head() ==
      StreamingCusum.changepointFromState(direct).head())
  }

  test("single-period state yields no changepoint row") {
    val df = Seq((5, 100L), (5, 200L)).toDF("k", "x")
    val state = StreamingCusum.periodSums(df)
    assert(StreamingCusum.changepointFromState(state).isEmpty)
  }
}
