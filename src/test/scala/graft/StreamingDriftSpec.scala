package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{BinMethod, BinSpec}
import graft.streaming.{StreamingAuc, StreamingDrift}

/** The streaming drift readouts against brute-force replays of the same
  * state rows, plus the micro-batch == batch state reuse (the state is
  * literally StreamingAuc's — one incremental aggregation feeds AUC, PSI,
  * and KS monitors).
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private val spec = BinSpec(0, 1000, 0.0, BinMethod.Linear)

  private def sample(seed: Int, n: Int): Seq[(Double, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n) {
      val y = if (r.nextBoolean()) 1L else 0L
      (math.min(9.9, r.nextInt(800) / 100.0 + y * r.nextInt(150) / 100.0), y)
    }
  }

  /** (bin -> (nRef, nCur)) replay of the state relation. */
  private def stateMap(rows: Seq[(Double, Long)]): Map[Long, (Long, Long)] =
    rows
      .map { case (v, y) => (math.floor(v * 100).toLong, y) }
      .filter { case (c, _) => c >= 0 && c <= 1000 }
      .groupBy(_._1)
      .map { case (bin, rs) =>
        bin -> (rs.count(_._2 == 1L).toLong, rs.count(_._2 == 0L).toLong)
      }

  test("psiFromState == brute replay; readout identical from stream or batch state") {
    implicit val sqlCtx = spark.sqlContext
    val all = sample(21, 800)
    val input = MemoryStream[(Double, Long)]
    val query = StreamingDrift
      .classBinCounts(input.toDF().toDF("value", "y"), spec)
      .writeStream.format("memory").queryName("sdrift_state").outputMode("complete").start()
    try {
      input.addData(all.take(400)); query.processAllAvailable()
      input.addData(all.drop(400)); query.processAllAvailable()
      val streamState = spark.table("sdrift_state")
      val batchState = StreamingDrift.classBinCounts(all.toDF("value", "y"), spec)
      val sp = StreamingDrift.psiFromState(streamState, spec).collect()
      val bp = StreamingDrift.psiFromState(batchState, spec).collect()
      assert(sp.toSeq == bp.toSeq, "PSI readout is a pure function of the state")

      val m = stateMap(all)
      val nb = spec.bins // smoothing uses the CONFIGURED bin count (batch-twin convention)
      val tr = m.values.map(_._1).sum.toDouble
      val tc = m.values.map(_._2).sum.toDouble
      assert(sp.length == m.size)
      sp.foreach { r =>
        val (nr, nc) = m(r.getAs[Number](0).longValue())
        assert(r.getLong(1) == nr && r.getLong(2) == nc)
        val pr = (nr + 0.5) / (tr + nb * 0.5)
        val pc = (nc + 0.5) / (tc + nb * 0.5)
        assert(math.abs(r.getDouble(3) - (pc - pr) * math.log(pc / pr)) <= 1e-6)
      }
    } finally query.stop()
  }

  test("PSI readout == batch psiContributions on an aligned grid (shared smoothing)") {
    // Pin min/max codes to the spec's domain ends so the batch operator's
    // data-driven grid ((c - minc) * bins) DIV (maxc - minc + 1) is the
    // identity on codes — then the batch and streaming PSI must agree
    // row-for-row because both smooth by +1/2 per CONFIGURED bin.
    val all = sample(29, 600) :+ ((0.004, 1L)) :+ ((9.994, 0L))
    val df = all.toDF("value", "y")
    val state = StreamingAuc.classBinCounts(df, spec)
    val sp = StreamingDrift.psiFromState(state, spec).collect()
    val bp = graft.operators.EvalOps.psiContributions(
      df, expr("CAST(floor(value * 100) AS BIGINT)"), col("y"), spec.bins).collect()
    assert(sp.length == bp.length)
    sp.zip(bp).foreach { case (s, b) =>
      assert(s.getAs[Number](0).longValue() == b.getLong(0))
      assert(s.getLong(1) == b.getLong(1) && s.getLong(2) == b.getLong(2))
      assert(s.getDouble(3) == b.getDouble(3),
        s"bin ${b.getLong(0)}: streaming ${s.getDouble(3)} != batch ${b.getDouble(3)}")
    }
  }

  test("ksFromState == brute replay of the gridded ECDF gap") {
    val all = sample(22, 700)
    val state = StreamingAuc.classBinCounts(all.toDF("value", "y"), spec)
    val r = StreamingDrift.ksFromState(state).head()
    val m = stateMap(all)
    val bins = m.keys.toSeq.sorted
    val tr = m.values.map(_._1).sum.toDouble
    val tc = m.values.map(_._2).sum.toDouble
    var cr = 0L; var cc = 0L
    val gaps = bins.map { b =>
      val (nr, nc) = m(b); cr += nr; cc += nc
      math.abs(cr / tr - cc / tc)
    }
    assert(r.getLong(0) == tr.toLong && r.getLong(1) == tc.toLong)
    assert(math.abs(r.getDouble(2) - gaps.max) <= 1e-6)
    val crit = 1.3581015 * math.sqrt((tr + tc) / (tr * tc))
    assert(math.abs(r.getDouble(3) - crit) <= 1e-6)
    assert(r.getBoolean(4) == (r.getDouble(2) > r.getDouble(3)))
  }

  test("grouped readouts == per-group ungrouped readouts on each slice") {
    val r = new scala.util.Random(23)
    val all = Seq.fill(900)((if (r.nextBoolean()) "f1" else "f2",
      math.min(9.9, r.nextInt(900) / 100.0), if (r.nextBoolean()) 1L else 0L))
    val df = all.toDF("feat", "value", "y")
    val state = StreamingDrift.classBinCountsBy(df, spec, Seq("feat"))
    val psiBy = StreamingDrift.psiFromStateBy(state, spec, Seq("feat")).collect()
      .groupBy(_.getString(0))
    val ksBy = StreamingDrift.ksFromStateBy(state, Seq("feat")).collect()
      .map(r0 => r0.getString(0) -> r0.toSeq.drop(1)).toMap
    for (f <- Seq("f1", "f2")) {
      val slice = all.filter(_._1 == f).map(t => (t._2, t._3)).toDF("value", "y")
      val sliceState = StreamingDrift.classBinCounts(slice, spec)
      val psi = StreamingDrift.psiFromState(sliceState, spec).collect()
      assert(psiBy(f).map(_.toSeq.drop(1)).toSeq == psi.map(_.toSeq).toSeq,
        s"grouped PSI for $f must equal the ungrouped readout of its slice")
      val ks = StreamingDrift.ksFromState(sliceState).head()
      assert(ksBy(f) == ks.toSeq, s"grouped KS for $f must equal its slice readout")
    }
  }

  test("single-population state yields NULL KS") {
    val df = Seq((1.0, 1L), (2.0, 1L)).toDF("value", "y")
    val r = StreamingDrift.ksFromState(StreamingAuc.classBinCounts(df, spec)).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }
}
