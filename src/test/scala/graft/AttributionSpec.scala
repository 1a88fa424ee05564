package graft

import org.apache.spark.sql.functions._

import graft.operators.AttributionOps

/** AttributionOps: journey → transition-count golden, first-purchase
  * truncation, removal monotonicity, credit normalization, and the
  * no-touch degenerate.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("user_id", "ts_us", "event_id", "event_type")

  test("transition counts golden: start/conv/null edges, self-loops, truncation") {
    val rows = Seq(
      (1L, 1L, 1L, "click"), (1L, 2L, 2L, "purchase"),
      (1L, 3L, 3L, "view"), // after first purchase -> outside the window
      (2L, 1L, 4L, "view"), (2L, 2L, 5L, "view"), (2L, 3L, 6L, "purchase"),
      (3L, 1L, 7L, "click"), // never converts -> click -> null
      (4L, 1L, 8L, "purchase")) // direct conversion: start -> conv
    val got = AttributionOps.transitionCounts(ev(rows))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("start", "click") -> 2L, ("start", "view") -> 1L, ("start", "conv") -> 1L,
      ("click", "conv") -> 1L, ("click", "null") -> 1L,
      ("view", "view") -> 1L, ("view", "conv") -> 1L))
  }

  test("event types outside the declared state domain are ignored, not new states") {
    // a 'refund' between click and purchase must be invisible: the chain
    // sees click -> conv directly (the oracle's pivot knows only the
    // declared states, so an unknown type becoming a state would
    // silently diverge engine from oracle)
    val rows = Seq(
      (1L, 1L, 1L, "click"), (1L, 2L, 2L, "refund"), (1L, 3L, 3L, "purchase"))
    val got = AttributionOps.transitionCounts(ev(rows))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("start", "click") -> 1L, ("click", "conv") -> 1L))
    val masks = AttributionOps.touchSetCounts(ev(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(masks == Map(1L -> 1L)) // click bit only; refund contributes nothing
  }

  test("removal is monotone and credits normalize") {
    val rows = Seq(
      (1L, 1L, 1L, "click"), (1L, 2L, 2L, "purchase"),
      (2L, 1L, 3L, "view"), (2L, 2L, 4L, "view"), (2L, 3L, 5L, "purchase"),
      (3L, 1L, 6L, "click"),
      (4L, 1L, 7L, "signup"), (4L, 2L, 8L, "click"), (4L, 3L, 9L, "purchase"),
      (5L, 1L, 10L, "error"))
    val out = AttributionOps.markovRemoval(ev(rows), iters = 12).collect()
    assert(out.map(_.getString(0)).toSeq == AttributionOps.Channels)
    val pBase = out.head.getLong(1)
    assert(out.forall(_.getLong(1) == pBase), "base probability identical per row")
    out.foreach { r =>
      assert(r.getLong(2) <= pBase, s"removal must not raise conversion (${r.getString(0)})")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val creditSum = out.map(_.getDouble(4)).sum
    assert(math.abs(creditSum - 1.0) < 1e-5, s"credits must normalize, got $creditSum")
    // error never touches a converting journey: removing it changes nothing
    val err = out.find(_.getString(0) == "error").get
    assert(err.getLong(2) == pBase && err.getDouble(3) == 0.0)
  }

  test("shapley: axioms on a hand-built corpus — efficiency, symmetry, null player") {
    // click and view appear in EXACTLY symmetric positions; error never
    // touches a converting journey; user 5 converts with no touches
    val rows = Seq(
      (1L, 1L, 1L, "click"), (1L, 2L, 2L, "purchase"),
      (2L, 1L, 3L, "view"), (2L, 2L, 4L, "purchase"),
      (3L, 1L, 5L, "click"), (3L, 2L, 6L, "view"), (3L, 3L, 7L, "purchase"),
      (4L, 1L, 8L, "error"), // unconverted
      (5L, 1L, 9L, "purchase"))
    val out = AttributionOps.shapley(ev(rows))
      .collect().map(r => r.getString(0) -> r).toMap
    // null player: error has zero value and zero credit
    assert(out("error").getLong(1) == 0L && out("error").getDouble(2) == 0.0)
    assert(out("signup").getLong(1) == 0L)
    // symmetry: click and view are exchangeable
    assert(out("click").getLong(1) == out("view").getLong(1))
    assert(out("click").getDouble(2) == 0.5 && out("view").getDouble(2) == 0.5)
    // efficiency: sum(phi) = 24 * (v(full) - v(empty)) = 24 * (4 - 1)
    assert(out.values.map(_.getLong(1)).sum == 24L * 3L)
  }

  test("shapley touch-set counts golden: masks, truncation, direct conversions") {
    val rows = Seq(
      (1L, 1L, 1L, "click"), (1L, 2L, 2L, "view"), (1L, 3L, 3L, "purchase"),
      (1L, 4L, 4L, "signup"), // after first purchase: excluded from the mask
      (2L, 1L, 5L, "purchase"), // direct: mask 0
      (3L, 1L, 6L, "error")) // unconverted: counted as 0 conversions
    val got = AttributionOps.touchSetCounts(ev(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // click bit 1 + view bit 8 = 9; error mask 2 with conv 0
    assert(got == Map(9L -> 1L, 0L -> 1L, 2L -> 0L))
  }

  test("upliftQini: brute-force replay, NULL before the first control unit") {
    // units: (score, t, y) — score 3 bucket has only treated units, so
    // its cumulative row precedes any control and qini must be NULL
    val units = Seq(
      (3L, 1L, 1L), (3L, 1L, 0L),
      (2L, 1L, 1L), (2L, 0L, 0L), (2L, 0L, 1L),
      (1L, 1L, 0L), (1L, 0L, 0L), (1L, 0L, 0L), (1L, 1L, 1L))
      .toDF("score", "t", "y")
    val got = graft.operators.EvalOps.upliftQini(units).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L), "descending score order")
    assert(got(0).isNullAt(9), "no control yet -> NULL qini")
    // brute replay at score >= 2: Y_t=2, N_t=3, Y_c=1, N_c=2 -> 2 - 1*3/2
    assert(got(1).getDouble(9) == 0.5)
    // full population: Y_t=3, N_t=5, Y_c=1, N_c=4 -> 3 - 1*5/4
    assert(got(2).getDouble(9) == 1.75)
    // cumulative counts are monotone non-decreasing down the curve
    val cums = got.map(r => (r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(cums.sliding(2).forall { case Array(a, b) =>
      b._1 >= a._1 && b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4
    })
  }

  test("upliftQini enforces the bounded-score contract (r12 verdict #3)") {
    // an uncapped score domain must fail loudly BEFORE the unpartitioned
    // cumulative window ranks it in one task
    val wide = (0L until 50L).map(i => (i, i % 2, i % 3 / 2)).toDF("score", "t", "y")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.EvalOps.upliftQini(wide, maxScores = 10).collect()
    }
    assert(ex.getMessage.contains("distinct scores exceed maxScores"))
    // at the boundary (cardinality == ceiling) the call succeeds and the
    // curve is the same relation the unguarded form produced
    val ok = graft.operators.EvalOps.upliftQini(wide, maxScores = 50)
    assert(ok.count() == 50L)
    graft.operators.DedupOps.releaseAllCaches()
  }

  test("upliftQini reads identically off incrementally-built state") {
    // the per-score sufficient stats are a mergeable complete-mode
    // aggregation: the curve read after N micro-batches equals batch
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(5)
    val units = Seq.fill(400)((rnd.nextInt(8).toLong, rnd.nextInt(2).toLong, rnd.nextInt(2).toLong))
    val input = MemoryStream[(Long, Long, Long)]
    val state = input.toDF().toDF("score", "t", "y")
      .groupBy(col("score"), col("t"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("ys"))
    val query = state.writeStream
      .format("memory").queryName("qini_state").outputMode("complete").start()
    try {
      input.addData(units.take(150)); query.processAllAvailable()
      input.addData(units.drop(150)); query.processAllAvailable()
      // per-(score, t) sufficient stats from the incremental state equal
      // the batch aggregation — everything upliftQini reads is mergeable
      val batchStats = units.toDF("score", "t", "y")
        .groupBy(col("score"), col("t"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("ys"))
      val streamStats = spark.table("qini_state")
      assert(streamStats.except(batchStats).isEmpty &&
        batchStats.except(streamStats).isEmpty,
        "incremental sufficient stats must equal batch")
    } finally query.stop()
  }

  test("parameterized channel domain (r12 verdict #4): wider taxonomy, guard boundary") {
    // a 5th channel the default domain would ignore becomes a real state
    val rows = Seq(
      (1L, 1L, 1L, "click"), (1L, 2L, 2L, "push"), (1L, 3L, 3L, "purchase"),
      (2L, 1L, 4L, "push"), (2L, 2L, 5L, "purchase"),
      (3L, 1L, 6L, "view"))
    val wide = Seq("click", "error", "push", "signup", "view")
    val tc = AttributionOps.transitionCounts(ev(rows), wide)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tc(("push", "conv")) == 2L && tc(("click", "push")) == 1L)
    val mk = AttributionOps.markovRemoval(ev(rows), iters = 12, channels = wide)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(mk.keySet == wide.toSet)
    // both converting journeys pass through push: removing it kills all
    // conversion, so push carries the dominant credit
    assert(mk("push").getDouble(4) > mk("click").getDouble(4))
    val sh = AttributionOps.shapley(ev(rows), wide)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(sh.keySet == wide.toSet)
    // efficiency at n=5: sum(phi) = 5! * (v(full) - v(empty)) = 120 * 2
    assert(sh.values.map(_.getLong(1)).sum == 120L * 2L)
    // guard boundary: over-wide, duplicate, and reserved domains refuse
    val tooWide = (1 to AttributionOps.MaxShapleyChannels + 1).map(i => s"c$i")
    assert(intercept[IllegalArgumentException] {
      AttributionOps.shapley(ev(rows), tooWide)
    }.getMessage.contains("driver-solve bound"))
    val tooWideMk = (1 to AttributionOps.MaxMarkovChannels + 1).map(i => s"c$i")
    assert(intercept[IllegalArgumentException] {
      AttributionOps.markovRemoval(ev(rows), channels = tooWideMk)
    }.getMessage.contains("driver-solve bound"))
    intercept[IllegalArgumentException] {
      AttributionOps.markovRemoval(ev(rows), channels = Seq("click", "click"))
    }
    intercept[IllegalArgumentException] {
      AttributionOps.shapley(ev(rows), Seq("click", "conv"))
    }
    // at exactly the Shapley bound the 2^16 DP still solves instantly
    val atBound = (1 to AttributionOps.MaxShapleyChannels).map(i => s"c$i")
    val flat = AttributionOps.shapley(ev(rows), atBound).collect()
    assert(flat.length == AttributionOps.MaxShapleyChannels &&
      flat.forall(_.getLong(1) == 0L))
  }

  test("memo tags: distinct channel domains cannot collide on a joined string") {
    // Seq("a,b") and Seq("a", "b") join to the same comma string; the
    // length-prefixed tag must keep their session memos separate
    val rows = Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "purchase"))
    val joined = AttributionOps.shapley(ev(rows), Seq("a,b")).collect()
    assert(joined.forall(_.getLong(1) == 0L), "no event type literally named 'a,b'")
    val split = AttributionOps.shapley(ev(rows), Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split("a") > 0L, "the 2-channel domain must not inherit the 1-channel memo")
  }

  test("direct-conversion-only corpus: zero removal effects, NULL credits") {
    val rows = Seq((1L, 1L, 1L, "purchase"), (2L, 1L, 2L, "purchase"))
    val out = AttributionOps.markovRemoval(ev(rows), iters = 12).collect()
    out.foreach { r =>
      assert(r.getLong(1) == 1000000000L && r.getLong(2) == 1000000000L)
      assert(r.getDouble(3) == 0.0, "removal effect zero when no touches exist")
      assert(r.isNullAt(4), "credit undefined when no channel has effect")
    }
  }
}
