package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{BinMethod, BinSpec}
import graft.streaming.StreamingAuc

/** The streaming AUC twin against the batch machinery:
  *
  *  1. the incremental class-split bin state after N micro-batches equals
  *     the batch aggregation over the union (A4 mergeability);
  *  2. the AUC read from the streaming state equals the read from the
  *     batch state, and equals EvalOps.binnedAuc on the same quantized
  *     codes when the grid is the identity (bins == code domain);
  *  3. the bracket property — the exact score-level AUC (pairwise, ties
  *     at 1/2) lies inside the reported `[err_lo, err_hi]`.
  */
class StreamingAucSpec extends SparkSpec {
  import spark.implicits._

  private val spec = BinSpec(0, 1000, 0.0, BinMethod.Linear)

  // (value in [0, 10), y) with class-dependent shift so the AUC is not 0.5
  private def sample(seed: Int, n: Int): Seq[(Double, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n) {
      val y = if (r.nextBoolean()) 1L else 0L
      val v = math.min(9.94, math.max(0.0, r.nextInt(800) / 100.0 + y * r.nextInt(200) / 100.0))
      (v, y)
    }
  }

  /** Exact pairwise AUC with ties at 1/2, on the quantized codes the
    * state sees (quantization is what the stream observes).
    */
  private def exactAuc(rows: Seq[(Double, Long)]): Double = {
    val codes = rows.map { case (v, y) => (math.floor(v * 100).toLong, y) }
    val pos = codes.filter(_._2 == 1L).map(_._1)
    val neg = codes.filter(_._2 == 0L).map(_._1)
    val u = (for (p <- pos; n <- neg)
      yield { if (p > n) 1.0 else if (p == n) 0.5 else 0.0 }).sum
    u / (pos.size.toDouble * neg.size.toDouble)
  }

  test("streaming class-bin state across micro-batches == batch state; AUC agrees") {
    implicit val sqlCtx = spark.sqlContext
    val all = sample(11, 900)
    val input = MemoryStream[(Double, Long)]
    val stream = StreamingAuc.classBinCounts(input.toDF().toDF("value", "y"), spec)
    val query = stream.writeStream
      .format("memory").queryName("sauc_state").outputMode("complete").start()
    try {
      input.addData(all.take(300)); query.processAllAvailable()
      input.addData(all.slice(300, 600)); query.processAllAvailable()
      input.addData(all.drop(600)); query.processAllAvailable()
      val streamState = spark.table("sauc_state")
      val batchState = StreamingAuc.classBinCounts(all.toDF("value", "y"), spec)
      assert(
        streamState.except(batchState).isEmpty && batchState.except(streamState).isEmpty,
        "incremental state must equal the batch aggregation")
      val sr = StreamingAuc.aucFromState(streamState).head()
      val br = StreamingAuc.aucFromState(batchState).head()
      assert(sr == br, "AUC readout is a pure function of the state")
      val exact = exactAuc(all)
      assert(exact >= sr.getDouble(3) - 1e-9 && exact <= sr.getDouble(4) + 1e-9,
        s"exact AUC $exact outside [${sr.getDouble(3)}, ${sr.getDouble(4)}]")
      assert(math.abs(sr.getDouble(2) - exact) <=
        (sr.getDouble(4) - sr.getDouble(3)) / 2 + 1e-9,
        "midpoint within half the bracket of the exact AUC")
    } finally query.stop()
  }

  test("identity grid: state AUC == EvalOps.binnedAuc midpoint, exactly") {
    val all = sample(12, 700)
    val df = all.toDF("value", "y")
    val state = StreamingAuc.classBinCounts(df, spec)
    val got = StreamingAuc.aucFromState(state).head()
    // binnedAuc on the same integer codes with bins == the code-domain
    // size ⇒ its grid is the identity on occupied codes, so the two
    // midpoints are the same statistic computed two ways
    val codes = df
      .select((col("value") * lit(100.0)).cast("bigint").as("c"), col("y"))
    val batch = graft.operators.EvalOps.binnedAuc(codes, col("c"), col("y"), 1001).head()
    assert(got.getLong(0) == batch.getLong(0) && got.getLong(1) == batch.getLong(1))
    assert(got.getDouble(2) == batch.getDouble(2),
      s"state midpoint ${got.getDouble(2)} != batch binnedAuc ${batch.getDouble(2)}")
  }

  test("single-class stream yields NULL auc and bounds") {
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 1L)).toDF("value", "y")
    val r = StreamingAuc.aucFromState(StreamingAuc.classBinCounts(df, spec)).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("PR ladder off the state == brute-force thresholds on the codes") {
    val all = sample(13, 800)
    val df = all.toDF("value", "y")
    val state = StreamingAuc.classBinCounts(df, spec)
    val got = StreamingAuc.prFromState(state).collect()

    // brute-force operating points on the quantized codes: predict
    // positive at code >= each occupied code, best-first
    val codes = all.map { case (v, y) => (math.floor(v * 100).toLong, y) }
    val pt = codes.count(_._2 == 1L).toDouble
    val occupied = codes.map(_._1).distinct.sorted.reverse
    assert(got.length == occupied.length)
    got.zip(occupied).foreach { case (row, thr) =>
      assert(row.getLong(0) == thr, s"bin order: ${row.getLong(0)} != $thr")
      val kept = codes.filter(_._1 >= thr)
      val tp = kept.count(_._2 == 1L)
      val prec = tp.toDouble / kept.size
      val rec = tp.toDouble / pt
      val f1 = 2.0 * tp / (kept.size + pt)
      assert(row.getLong(3) == kept.size && row.getLong(4) == tp)
      assert(math.abs(row.getDouble(5) - prec) < 5e-7, s"precision at $thr")
      assert(math.abs(row.getDouble(6) - rec) < 5e-7, s"recall at $thr")
      assert(math.abs(row.getDouble(7) - f1) < 5e-7, s"f1 at $thr")
    }
    // AP contributions sum to the standard threshold-sweep AP
    val apGot = got.map(r => r.getDouble(8)).sum
    val apExact = occupied.map { thr =>
      val kept = codes.filter(_._1 >= thr)
      val tp = kept.count(_._2 == 1L)
      val dAtThr = codes.count(c => c._1 == thr && c._2 == 1L)
      (dAtThr / pt) * (tp.toDouble / kept.size)
    }.sum
    assert(math.abs(apGot - apExact) < 1e-4, s"AP $apGot != $apExact")

    // readout is a pure function of the state: batch state == same ladder
    val batch = StreamingAuc.prFromState(StreamingAuc.classBinCounts(df, spec)).collect()
    assert(got.sameElements(batch))
  }
}
