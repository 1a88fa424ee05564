package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{BinMethod, BinSpec}
import graft.streaming.StreamingQuantiles

/** The streaming cut-key twin against the exact batch machinery:
  *
  *  1. the incremental bin-count STATE after N micro-batches equals the
  *     batch aggregation over the union (the A4 mergeability argument);
  *  2. cuts read from the streaming state equal cuts read from the batch
  *     state (same pure function of the same state);
  *  3. the bracket property — every streaming cut's `[err_lo, err_hi]`
  *     interval contains the EXACT batch ntile cut value, so the bin
  *     resolution is the only error term.
  */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val spec = BinSpec(0, 1000, 0.0, BinMethod.Linear)

  // values in [0, 10): quantize ×100 → codes [0, 1000)
  private def sample(seed: Int, n: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(r.nextInt(995) / 100.0 + r.nextInt(100) / 10000.0)
  }

  test("streaming bin-count state across micro-batches == batch state; cuts agree") {
    implicit val sqlCtx = spark.sqlContext
    val all = sample(1, 900)
    val input = MemoryStream[Double]
    val stream = StreamingQuantiles.binCounts(input.toDF().toDF("value"), spec)
    val query = stream.writeStream
      .format("memory")
      .queryName("sq_state")
      .outputMode("complete")
      .start()
    try {
      // three micro-batches: the later ones UPDATE existing bin rows —
      // the incremental merge path, not a single-batch aggregate
      input.addData(all.take(300))
      query.processAllAvailable()
      input.addData(all.slice(300, 600))
      query.processAllAvailable()
      input.addData(all.drop(600))
      query.processAllAvailable()
      val streamState = spark.table("sq_state")
      val batchState = StreamingQuantiles.binCounts(all.toDF("value"), spec)
      assert(
        streamState.except(batchState).isEmpty && batchState.except(streamState).isEmpty,
        "incremental state must equal the batch aggregation")

      val streamCuts = StreamingQuantiles.cutsFromState(streamState, spec, 4).collect()
      val batchCuts = StreamingQuantiles.cutsFromState(batchState, spec, 4).collect()
      assert(streamCuts.toSeq == batchCuts.toSeq)
    } finally query.stop()
  }

  test("grouped state across micro-batches == grouped batch state; per-group cuts agree") {
    implicit val sqlCtx = spark.sqlContext
    val r = new scala.util.Random(4)
    val all = Seq.fill(600)((if (r.nextBoolean()) "a" else "b", r.nextInt(990) / 100.0))
    val input = MemoryStream[(String, Double)]
    val stream = StreamingQuantiles.binCountsBy(
      input.toDF().toDF("grp", "value"), spec, Seq("grp"))
    val query = stream.writeStream
      .format("memory")
      .queryName("sq_grp_state")
      .outputMode("complete")
      .start()
    try {
      input.addData(all.take(200)); query.processAllAvailable()
      input.addData(all.drop(200)); query.processAllAvailable()
      val streamState = spark.table("sq_grp_state")
      val batchState = StreamingQuantiles.binCountsBy(all.toDF("grp", "value"), spec, Seq("grp"))
      assert(streamState.except(batchState).isEmpty && batchState.except(streamState).isEmpty)
      val sc = StreamingQuantiles.cutsFromStateBy(streamState, spec, 4, Seq("grp")).collect()
      val bc = StreamingQuantiles.cutsFromStateBy(batchState, spec, 4, Seq("grp")).collect()
      assert(sc.toSeq == bc.toSeq && sc.length == 6, "3 cuts per group, identical from either state")
    } finally query.stop()
  }

  test("streaming cut intervals bracket the exact batch ntile cuts, any k") {
    for (k <- Seq(2, 3, 5, 10); seed <- Seq(2, 3)) {
      val vals = sample(seed, 500 + seed * 37)
      val state = StreamingQuantiles.binCounts(vals.toDF("value"), spec)
      val cuts = StreamingQuantiles.cutsFromState(state, spec, k).collect()
      assert(cuts.length == k - 1, s"k=$k: one cut per boundary")
      // exact ntile boundary values by definition: the value at the
      // boundary rank in ascending order (quantized domain, like the state)
      val sorted = vals
        .map(v => math.floor(v * 100) / 100.0) // value at bin-code resolution
        .sorted
      val n = sorted.length
      cuts.foreach { r =>
        val j = r.getInt(0)
        val t = ((n / k) * j + math.min(j, n % k)).toInt
        val exact = sorted(t - 1)
        val (lo, hi) = (r.getDouble(3), r.getDouble(4))
        assert(
          exact >= lo - 1e-9 && exact <= hi + 1e-9,
          s"k=$k j=$j: exact cut $exact outside streaming interval [$lo, $hi]")
        assert(r.getLong(1) == t, s"boundary rank must be the ntile rank")
      }
    }
  }
}
