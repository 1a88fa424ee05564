package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingContingency

/** The streaming contingency twin against the batch machinery:
  *
  *  1. the cell state after N micro-batches equals the batch aggregation
  *     over the union (keyed counts are order-insensitive);
  *  2. all three readouts (kappa, chi², MI) off the streaming state equal
  *     the batch operators on the same rows — purity of the shared
  *     from-cells suffix;
  *  3. two disjoint half-states merge by summing into the union's state.
  */
class StreamingContingencySpec extends SparkSpec {
  import spark.implicits._

  private def sample(seed: Int, n: Int): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n) {
      val a = r.nextInt(3) + 1L
      // correlated second rater so kappa/chi2/MI are non-trivial
      val b = if (r.nextInt(10) < 6) a else r.nextInt(3) + 1L
      (a, b)
    }
  }

  test("streaming cell state across micro-batches == batch; all three readouts agree") {
    implicit val sqlCtx = spark.sqlContext
    val all = sample(3, 600)
    val input = MemoryStream[(Long, Long)]
    val stream = StreamingContingency.cellCounts(input.toDF().toDF("a", "b"))
    val query = stream.writeStream
      .format("memory").queryName("scont_state").outputMode("complete").start()
    try {
      input.addData(all.take(200)); query.processAllAvailable()
      input.addData(all.slice(200, 400)); query.processAllAvailable()
      input.addData(all.drop(400)); query.processAllAvailable()
      val streamState = spark.table("scont_state")
      val batchState = StreamingContingency.cellCounts(all.toDF("a", "b"))
      assert(
        streamState.except(batchState).isEmpty && batchState.except(streamState).isEmpty,
        "incremental state must equal the batch aggregation")
      val df = all.toDF("ra", "rb")
      assert(StreamingContingency.kappaFromState(streamState, 3).head() ==
        graft.operators.EvalOps.cohenKappa(df, "ra", "rb", 3).head(),
        "kappa readout is a pure function of the state")
      assert(StreamingContingency.chi2FromState(streamState).collect().toSeq ==
        graft.operators.EvalOps.chi2Independence(df, "ra", "rb")
          .withColumnRenamed("ra", "a").withColumnRenamed("rb", "b")
          .collect().toSeq,
        "chi2 readout equals the batch operator cell-for-cell")
      assert(StreamingContingency.miFromState(streamState).collect().toSeq ==
        graft.operators.EvalOps.categoricalMi(df, "ra", "rb")
          .withColumnRenamed("ra", "a").withColumnRenamed("rb", "b")
          .collect().toSeq,
        "MI readout equals the batch operator cell-for-cell")
    } finally query.stop()
  }

  test("disjoint half-states merge by summing into the union's state") {
    val all = sample(4, 400)
    val (h1, h2) = all.splitAt(200)
    val merged = StreamingContingency.cellCounts(h1.toDF("a", "b"))
      .union(StreamingContingency.cellCounts(h2.toDF("a", "b")))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("n_ab")).as("n_ab"))
    val direct = StreamingContingency.cellCounts(all.toDF("a", "b"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
    assert(StreamingContingency.kappaFromState(merged, 3).head() ==
      StreamingContingency.kappaFromState(direct, 3).head())
  }
}
