package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{BinMethod, BinSpec}
import graft.streaming.StreamingHistogram

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val spec = BinSpec.derive(0.0, 100.0, BinMethod.Linear)

  private def sampleEvents: Seq[(Timestamp, Double)] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 500).map { i =>
      (new Timestamp(base + i * 60000L), (i % 97).toDouble + 0.25)
    }
  }

  test("streaming windowed histogram == batch windowed histogram") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val stream = StreamingHistogram.windowedCounts(
      input.toDF().toDF("ts", "value"),
      spec,
      "1 hour",
      watermarkDelay = Some("30 minutes"))
    val query = stream.writeStream
      .format("memory")
      .queryName("stream_hist")
      .outputMode("complete")
      .start()
    try {
      // two micro-batches — the second updates existing window state,
      // exercising the incremental merge (A4 associativity)
      input.addData(sampleEvents.take(250))
      query.processAllAvailable()
      input.addData(sampleEvents.drop(250))
      query.processAllAvailable()

      val streamed = spark
        .table("stream_hist")
        .orderBy("win_start", "bin")
        .collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
        .toSeq
      val batch = StreamingHistogram
        .windowedCounts(sampleEvents.toDF("ts", "value"), spec, "1 hour")
        .orderBy("win_start", "bin")
        .collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
        .toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally query.stop()
  }

  test("streaming A/B stats == batch stats across a mid-experiment batch split") {
    implicit val sqlCtx = spark.sqlContext
    val events: Seq[(Long, Double)] =
      (0 until 400).map(i => (i.toLong % 37, (i % 89).toDouble + 0.55))
    val input = MemoryStream[(Long, Double)]
    val stream = graft.streaming.StreamingAbTest.variantStats(
      input.toDF().toDF("user_id", "value"))
    val query = stream.writeStream
      .format("memory")
      .queryName("stream_ab")
      .outputMode("complete")
      .start()
    try {
      input.addData(events.take(150))
      query.processAllAvailable()
      input.addData(events.drop(150))
      query.processAllAvailable()
      def row(r: org.apache.spark.sql.Row) =
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
      val streamed = spark.table("stream_ab").collect().map(row).toMap
      val batch = graft.streaming.StreamingAbTest
        .variantStats(events.toDF("user_id", "value"))
        .collect()
        .map(row)
        .toMap
      // incremental state merge must reproduce the batch sufficient stats
      // exactly — they are integer sums, so not just approximately
      assert(streamed == batch)
      assert(streamed.keySet == Set(0L, 1L))
      // and the finishing z is a pure function of those stats
      val z = graft.streaming.StreamingAbTest.withZ(streamed(0L), streamed(1L))
      assert(!z.isNaN && math.abs(z) < 50)
    } finally query.stop()
  }

  test("sequential readout: incremental look-state == batch; OBF boundary readout identical") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingSequential
    // declared look calendar: ts in [0, 999], 5 looks of 200 each; events
    // arrive OUT of look order across micro-batches — mergeable state
    // must not care
    val events: Seq[(Long, Double, Long)] =
      (0 until 600).map(i => (i.toLong % 41, (i % 97).toDouble + 0.25, (i * 13L) % 1000L))
    val lookCol = StreamingSequential.lookOf(col("ts_us"), lit(0L), lit(999L), 5)
    val input = MemoryStream[(Long, Double, Long)]
    val stream = StreamingSequential.lookStats(
      input.toDF().toDF("user_id", "value", "ts_us"), lookCol)
    val query = stream.writeStream
      .format("memory").queryName("stream_seq").outputMode("complete").start()
    try {
      input.addData(events.take(200)); query.processAllAvailable()
      input.addData(events.slice(200, 450)); query.processAllAvailable()
      input.addData(events.drop(450)); query.processAllAvailable()
      def row(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))
      val streamed = spark.table("stream_seq").collect().map(row).toMap
      val batchState = StreamingSequential.lookStats(
        events.toDF("user_id", "value", "ts_us"), lookCol)
      assert(streamed == batchState.collect().map(row).toMap)
      assert(streamed.keySet.map(_._1) == Set(0L, 1L, 2L, 3L, 4L))
      // the readout is a pure function of the state: stream and batch
      // state produce the identical boundary table
      val a = StreamingSequential.obfReadout(spark.table("stream_seq"), 5, 2.04)
        .collect().toSeq
      val b = StreamingSequential.obfReadout(batchState, 5, 2.04).collect().toSeq
      assert(a == b)
      // boundary is monotone decreasing toward z_final at the last look
      val bounds = a.map(_.getDouble(4))
      assert(bounds == bounds.sorted.reverse && math.abs(bounds.last - 2.04) < 1e-9)
      // cumulative n at the last look equals all valid units
      assert(a.last.getLong(1) + a.last.getLong(2) == 600L)
      // decide_look is constant across rows and equals the first crossing
      val firstCross = a.find(_.getBoolean(5)).map(_.getLong(0))
      a.foreach { r =>
        val dl = if (r.isNullAt(6)) None else Some(r.getLong(6))
        assert(dl == firstCross)
      }
      // the mSPRT twin reads the same state: always-valid p is in (0, 1],
      // non-increasing down the looks (a running min by construction),
      // identical off streamed and batch state, and matches a driver
      // replay of the closed form at every look
      val am = StreamingSequential.msprtReadout(spark.table("stream_seq"), 50.0)
        .collect().toSeq
      val bm = StreamingSequential.msprtReadout(batchState, 50.0).collect().toSeq
      assert(am == bm)
      val ps = am.map(_.getDouble(7))
      assert(ps.forall(x => x > 0.0 && x <= 1.0))
      assert(ps.sliding(2).forall { case Seq(x, y) => y <= x + 1e-12; case _ => true })
      // driver replay from the cumulative stats of the OBF readout fixture
      var runMax = 0.0
      am.foreach { r =>
        val k = r.getLong(0)
        val upTo = events.filter(e => e._3 * 5L / 1000L <= k)
        val (arm0, arm1) = upTo.partition(_._1 % 2 == 0)
        def stats(xs: Seq[(Long, Double, Long)]) = {
          val cs = xs.map(e => math.floor(e._2 * 100.0).toLong)
          (cs.size.toLong, cs.sum, cs.map(c => c * c).sum)
        }
        val (na, sa, qa) = stats(arm0); val (nb, sb, qb) = stats(arm1)
        assert(r.getLong(1) == na && r.getLong(2) == nb)
        val va = (qa.toDouble - sa.toDouble * sa.toDouble / na) / (na - 1.0)
        val vb = (qb.toDouble - sb.toDouble * sb.toDouble / nb) / (nb - 1.0)
        val v = va / na + vb / nb
        val d = sa.toDouble / na - sb.toDouble / nb
        val ll = math.rint((0.5 * math.log(v / (v + 2500.0)) +
          d * d * 2500.0 / (2.0 * v * (v + 2500.0))) * 1e6) / 1e6
        // 2e-6 tolerance: the replay's rint is half-even where Spark's
        // round is half-up — formula parity is the pin, not tie-breaking
        assert(math.abs(r.getDouble(4) - ll) < 2e-6, s"look $k log_lambda")
        runMax = math.max(runMax, math.max(0.0, ll))
        assert(math.abs(r.getDouble(7) - math.exp(-runMax)) < 2e-6)
        // anytime-valid CS: centered on delta with the mixture half width
        val hw = math.sqrt((2.0 * v * (v + 2500.0) / 2500.0) *
          math.log(math.sqrt((v + 2500.0) / v) / 0.05))
        assert(math.abs(r.getDouble(5) - (d - hw)) < 2e-6, s"look $k ci_lo")
        assert(math.abs(r.getDouble(6) - (d + hw)) < 2e-6, s"look $k ci_hi")
        assert(r.getDouble(5) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(6),
          "interval must contain the observed delta")
      }
    } finally query.stop()
  }

  test("grouped sequential readouts: every group slice equals the ungrouped readout on it") {
    import graft.streaming.StreamingSequential
    // lookOf clamps BOTH calendar edges: pre-t0 (clock skew) lands in
    // look 0, post-t1 in the last look — never a negative index
    val edges = spark.range(1).select(
      StreamingSequential.lookOf(lit(-50L), lit(0L), lit(999L), 5).as("lo"),
      StreamingSequential.lookOf(lit(5000L), lit(0L), lit(999L), 5).as("hi"))
      .collect()(0)
    assert(edges.getLong(0) == 0L && edges.getLong(1) == 4L)
    val looked = (0 until 600)
      .map(i => (i.toLong % 41, (i % 97).toDouble + 0.25, (i * 13L) % 1000L))
      .toDF("user_id", "value", "ts_us")
      .withColumn("grp", pmod(col("user_id"), lit(3L)))
    val lookCol = StreamingSequential.lookOf(col("ts_us"), lit(0L), lit(999L), 5)
    val stateBy = StreamingSequential.lookStatsBy(looked, lookCol)
    val obfBy = StreamingSequential.obfReadoutBy(stateBy, 5, 2.04).collect()
      .groupBy(_.getLong(0))
    val msBy = StreamingSequential.msprtReadoutBy(stateBy, 50.0).collect()
      .groupBy(_.getLong(0))
    for (g <- 0L to 2L) {
      val slice = looked.filter(col("grp") === g)
      val st = StreamingSequential.lookStats(slice, lookCol)
      val obf = StreamingSequential.obfReadout(st, 5, 2.04).collect().toSeq
      val ms = StreamingSequential.msprtReadout(st, 50.0).collect().toSeq
      assert(obfBy(g).toSeq.map(r => r.toSeq.drop(1)) == obf.map(_.toSeq), s"obf grp $g")
      assert(msBy(g).toSeq.map(r => r.toSeq.drop(1)) == ms.map(_.toSeq), s"msprt grp $g")
    }
  }

  test("windowed counts sum to valid input rows (batch)") {
    val df = StreamingHistogram.windowedCounts(sampleEvents.toDF("ts", "value"), spec, "1 hour")
    assert(df.agg(sum("cnt")).head().getLong(0) == 500L)
  }

  test("sliding windows: each event lands in window/slide windows") {
    val df = StreamingHistogram.windowedCounts(
      sampleEvents.toDF("ts", "value"),
      spec,
      "1 hour",
      slideDuration = Some("15 minutes"))
    // 1h window sliding by 15min → every event in exactly 4 windows
    assert(df.agg(sum("cnt")).head().getLong(0) == 500L * 4)
  }

  test("stream-stream correlation join matches pairs within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val joined = graft.streaming.StreamingJoin.correlate(
      views.toDF().toDF("ts", "user_id"),
      clicks.toDF().toDF("ts", "user_id"),
      "user_id",
      watermark = "1 hour",
      maxDelay = "10 minutes")
    val q = joined.writeStream
      .format("memory")
      .queryName("corr_out")
      .outputMode("append")
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      views.addData((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:00:00"), 2L))
      clicks.addData(
        (t("2024-01-01 10:05:00"), 1L), // within 10 min → match
        (t("2024-01-01 10:30:00"), 2L)) // too late → no match
      q.processAllAvailable()
      val got = spark
        .table("corr_out")
        .select("user_id")
        .collect()
        .map(_.getLong(0))
        .toSeq
      assert(got == Seq(1L))
    } finally q.stop()
  }

  test("stream-static enrichment: broadcast dim probe, unmatched rows kept") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Timestamp, Long)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val enriched = graft.streaming.StreamingJoin.enrich(
      events.toDF().toDF("ts", "user_id"), dim, "user_id")
    val q = enriched.writeStream
      .format("memory")
      .queryName("enrich_out")
      .outputMode("append")
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      events.addData((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:01:00"), 9L))
      q.processAllAvailable()
      // second micro-batch probes the same broadcast — no state growth
      events.addData((t("2024-01-01 10:02:00"), 2L))
      q.processAllAvailable()
      // using-join output order: (user_id, ts, tier)
      val got = spark
        .table("enrich_out")
        .orderBy("ts")
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(2)).getOrElse("none")))
        .toSeq
      assert(got == Seq(1L -> "gold", 9L -> "none", 2L -> "silver"))
      // no stateful operator in the plan: enrichment must not accumulate
      // join state the way a stream-stream join does
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops cross-batch duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val deduped = graft.streaming.StreamingDedup.dedupByKey(
      input.toDF().toDF("ts", "event_id", "value"),
      "event_id",
      watermarkDelay = "1 hour")
    val q = deduped.writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode("append")
      .start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData((t0, 1L, 10.0), (t0, 1L, 10.0), (t0, 2L, 20.0))
      q.processAllAvailable()
      input.addData((t0, 1L, 10.0), (t0, 3L, 30.0)) // retry dup of id 1 in a later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming transitions == batch lag-window transitions (cross-batch chain)") {
    import graft.streaming.StreamingTransitions
    import graft.streaming.StreamingTransitions.TEv
    implicit val sqlCtx = spark.sqlContext
    // 3 users × interleaved types; the split point lands mid-user so the
    // first event of batch 2 must chain off batch 1's state
    val evs = (0 until 90).map { i =>
      TEv(i % 3L, i.toLong, 1000000L * i, Seq("view", "click", "purchase")(i % 4 % 3))
    }
    val input = MemoryStream[TEv]
    val q = StreamingTransitions
      .transitionsStateful(input.toDS())
      .writeStream
      .format("memory")
      .queryName("trans_out")
      .outputMode("append")
      .start()
    try {
      input.addData(evs.take(45))
      q.processAllAvailable()
      input.addData(evs.drop(45))
      q.processAllAvailable()
      val streamed = spark
        .table("trans_out")
        .groupBy("prev_type", "event_type")
        .count()
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
        .toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val batch = evs
        .toDF()
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .count()
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
        .toMap
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming debounce == batch lag-window debounce (cross-batch suppression)") {
    import graft.streaming.StreamingDebounce
    import graft.streaming.StreamingDebounce.DEv
    implicit val sqlCtx = spark.sqlContext
    // bursts: users fire every 2 s, threshold 5 s — only burst openers
    // survive; the batch split lands mid-burst so batch 2's first events
    // must be suppressed against batch 1's state
    val evs = (0 until 90).map { i =>
      val burst = i / 9 // 9 events per burst, 2 s apart, bursts 60 s apart
      DEv(i % 3L, i.toLong, burst * 60000000L + (i / 3 % 3) * 2000000L,
        Seq("view", "click", "purchase")(i % 3))
    }
    val input = MemoryStream[DEv]
    val q = StreamingDebounce
      .debounceStateful(input.toDS(), gapUs = 5000000L)
      .writeStream
      .format("memory")
      .queryName("debounce_out")
      .outputMode("append")
      .start()
    try {
      input.addData(evs.take(40))
      q.processAllAvailable()
      input.addData(evs.drop(40))
      q.processAllAvailable()
      val streamed = spark
        .table("debounce_out")
        .select("event_id")
        .collect()
        .map(_.getLong(0))
        .toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val batch = evs
        .toDF()
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .filter(col("prev_us").isNull || col("ts_us") - col("prev_us") > 5000000L)
        .select("event_id")
        .collect()
        .map(_.getLong(0))
        .toSet
      assert(streamed.nonEmpty && streamed == batch)
      assert(streamed.size < evs.size, "suppression actually happened")
    } finally q.stop()
  }
}
