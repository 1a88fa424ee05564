package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.operators.SketchOps

/** MisraGries summary + heavyHittersMg: the superset guarantee under
  * adversarial merge orders, the underestimate bound, and the
  * determinism of the verified output despite merge-order-dependent
  * counters.
  */
class MgSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: key i repeated freq(i) times
  private def stream(freqs: Map[Long, Int], seed: Int): Seq[Long] = {
    val flat = freqs.toSeq.flatMap { case (k, f) => Seq.fill(f)(k) }
    new scala.util.Random(seed).shuffle(flat)
  }

  test("driver replay: every key above n/(k+1) survives any merge tree; counts underestimate") {
    val mg = new MisraGries(4)
    val freqs = Map(1L -> 400, 2L -> 300, 3L -> 150, 4L -> 40, 5L -> 40,
      6L -> 30, 7L -> 20, 8L -> 20)
    val n = freqs.values.sum // 1000; threshold n/(k+1) = 200
    for (seed <- 1 to 5) {
      val data = stream(freqs, seed)
      // adversarial merge tree: fold in uneven chunks, merge pairwise
      val chunks = data.grouped(37).toSeq.map(_.foldLeft(mg.zero)(mg.reduce))
      val merged = mg.effective(chunks.reduce(mg.merge))
      assert(merged.size <= 4, s"state bound violated: ${merged.size}")
      for ((k, f) <- freqs if f * 5 > n) {
        assert(merged.contains(k), s"true heavy hitter $k lost (seed $seed)")
        assert(merged(k) <= f, s"MG counter must underestimate (key $k)")
        assert(merged(k) >= f - n / 5, s"underestimate bound violated (key $k)")
      }
      // debt-counter form ≡ textbook decrement-all rebuild, state for state
      val textbook = data.foldLeft(Map.empty[Long, Long]) { (m, key) =>
        m.get(key) match {
          case Some(c) => m.updated(key, c + 1L)
          case None if m.size < 4 => m.updated(key, 1L)
          case None => m.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
        }
      }
      val debt = mg.effective(data.foldLeft(mg.zero)(mg.reduce))
      assert(debt == textbook, s"debt form diverged from textbook MG (seed $seed)")
    }
  }

  test("heavyHittersMg: exact deterministic output under different partitionings") {
    val freqs = Map(1L -> 400, 2L -> 300, 3L -> 150, 4L -> 40, 5L -> 40,
      6L -> 30, 7L -> 20, 8L -> 20)
    val df = stream(freqs, 9).toDF("v")
    def run(parts: Int) = SketchOps
      .heavyHittersMg(df.repartition(parts), col("v"), k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run(2)
    // exactly the true > n/5 set, with exact counts
    assert(a == Seq(("1", 400L, 1000L), ("2", 300L, 1000L)))
    assert(run(7) == a && run(31) == a, "verified output must be layout-independent")
  }

  test("streaming complete-mode MG aggregation keeps the superset guarantee") {
    // the Aggregator doubles as mergeable STREAMING state: candidates
    // after N micro-batches must still contain every key above n/(k+1)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val freqs = Map(1L -> 400, 2L -> 300, 3L -> 150, 4L -> 40, 5L -> 40,
      6L -> 30, 7L -> 20, 8L -> 20)
    val data = stream(freqs, 3)
    val input = MemoryStream[Long]
    val mg = new MisraGries(4)
    val agg = input.toDS().groupByKey(_ => 0).agg(mg.toColumn.name("cands"))
    val query = agg.writeStream
      .format("memory").queryName("mg_state").outputMode("complete").start()
    try {
      input.addData(data.take(300)); query.processAllAvailable()
      input.addData(data.slice(300, 700)); query.processAllAvailable()
      input.addData(data.drop(700)); query.processAllAvailable()
      val cands = spark.table("mg_state")
        .select(explode(col("cands._2")).as("h")).collect().map(_.getLong(0)).toSet
      assert(cands.size <= 4, s"state bound violated: $cands")
      val n = freqs.values.sum
      // the summary's own count equals the stream length after any merge tree
      assert(spark.table("mg_state").select(col("cands._1"))
        .collect().head.getLong(0) == n.toLong)
      for ((k, f) <- freqs if f * 5 > n)
        assert(cands(k), s"true heavy hitter $k lost across micro-batches")
    } finally query.stop()
  }

  test("heavyHittersMg: empty result when nothing crosses the threshold") {
    val df = (1L to 200L).toDF("v") // all frequencies 1, k=4 -> threshold 40
    assert(SketchOps.heavyHittersMg(df, col("v"), k = 4).count() == 0)
  }

  test("heavyHittersMg: NULL keys drop instead of crashing the typed aggregation") {
    val rows: Seq[Option[Long]] =
      Seq.fill(50)(Some(7L)) ++ Seq.fill(30)(None) ++ (11L to 20L).map(Some(_))
    val df = rows.toDF("v")
    val got = SketchOps.heavyHittersMg(df, col("v"), k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // n_total counts the 60 non-null keys; 7 (50/60) is the only hitter
    assert(got.toSeq == Seq(("7", 50L, 60L)))
  }
}
