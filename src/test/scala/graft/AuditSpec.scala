package graft

import org.apache.spark.sql.functions._

import graft.operators.{LayoutOps, ProfileOps}
import graft.sources.Tables

/** Round-4 analytics additions: drift tests, attribution, rolling RANGE
  * windows, correlation/OLS from exact sufficient stats, compaction
  * planning, vocabulary growth, degree histogram, FK audit.
  */
class AuditSpec extends SparkSpec {

  import spark.implicits._

  // --- corrMatrix / olsByGroup on constructed fixtures ---------------

  test("corrMatrix: exact ±1 on linear fixtures, symmetric n") {
    val df = Seq.tabulate(50)(i => (i.toDouble, 2.0 * i, 100.0 - i))
      .toDF("a", "b", "c")
    val rows = ProfileOps.corrMatrix(df, Seq("a", "b", "c")).collect()
    assert(rows.length == 3)
    val m = rows.map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(m(("a", "b")) == 1.0, "perfect positive correlation")
    assert(m(("a", "c")) == -1.0, "perfect negative correlation")
    assert(m(("b", "c")) == -1.0)
    assert(rows.forall(_.getLong(2) == 50L), "listwise n is shared")
  }

  test("corrMatrix: NaN rows drop listwise (every pair sees the same n)") {
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, Double.NaN), (4.0, 4.0))
      .toDF("x", "y")
    val rows = ProfileOps.corrMatrix(df, Seq("x", "y")).collect()
    assert(rows.head.getLong(2) == 3L)
    assert(rows.head.getDouble(3) == 1.0)
  }

  test("olsByGroup: recovers an exact line per group") {
    // y = 3x + 5 in group g1; y = -2x + 40 in group g2 (dollar units so
    // the cents quantization is exact)
    val g1 = Seq.tabulate(20)(i => ("g1", i.toDouble, 3.0 * i + 5.0))
    val g2 = Seq.tabulate(20)(i => ("g2", i.toDouble, -2.0 * i + 40.0))
    val df = (g1 ++ g2).toDF("g", "x", "y")
    val rows = ProfileOps.olsByGroup(df, "g", "x", "y").collect()
    val m = rows.map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(m("g1") == ((3.0, 500.0, 1.0)), "slope cents-per-cent, intercept in cents")
    assert(m("g2") == ((-2.0, 4000.0, 1.0)))
  }

  // --- compaction planning -------------------------------------------

  test("compactionBins: conserves files/bytes and overshoots by at most one file") {
    val target = 4000L
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val plan = LayoutOps
      .compactionBins(docs, "source", "doc_id", "n_chars", target)
      .collect()
    val totals = docs.agg(count(lit(1)), sum(col("n_chars"))).head()
    assert(plan.map(_.getLong(2)).sum == totals.getLong(0), "every file assigned once")
    assert(plan.map(_.getLong(3)).sum == totals.getLong(1), "bytes conserved")
    val maxFile = docs.agg(max(col("n_chars"))).head().getLong(0)
    plan.foreach { r =>
      assert(r.getLong(3) < target + maxFile,
        s"bin ${r.get(0)}/${r.get(1)} exceeds target by more than one file")
    }
    // bins are contiguous id ranges per partition: max_id of bin k sits
    // below min_id of bin k+1
    plan.groupBy(_.getString(0)).foreach { case (_, bins) =>
      val sorted = bins.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4), "id ranges do not interleave")
        case _           => ()
      }
    }
  }

  test("zoneSkipping golden: sorted layout halves the scan, natural skips nothing") {
    // 20 rows, 5-row files; ship days alternate 100/200 so every natural
    // file spans both days while the sorted layout separates them cleanly
    val rows = (1 to 20).map { i =>
      val day = if (i % 2 == 1) 100 else 200
      (i.toLong, 1, new java.sql.Date(day * 86400000L))
    }
    val df = rows.toDF("l_orderkey", "l_linenumber", "l_shipdate")
    val out = LayoutOps
      .zoneSkipping(df, fileRows = 5, loDay = 100, hiDay = 100)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out("natural") == ((4L, 4L, 20L, 0.0)))
    assert(out("shipdate") == ((4L, 2L, 10L, 0.5)))
  }

  // --- drift + attribution + rolling over events ---------------------

  test("drift_ks: statistic bounded in [0,1] and counts partition the corpus") {
    val r = EventsQueries.queries("drift_ks")(spark, TestSpark.sf0001).head()
    val total = Tables.events(spark, TestSpark.sf0001)
      .filter(col("value").isNotNull && !isnan(col("value"))).count()
    assert(r.getLong(0) + r.getLong(1) == total)
    val ks = r.getDouble(2)
    assert(ks >= 0.0 && ks <= 1.0)
    assert(r.getDouble(3) > 0.0, "critical value positive")
  }

  test("chi2_drift: contributions nonnegative, splits cover every event") {
    val rows = EventsQueries.queries("chi2_drift")(spark, TestSpark.sf0001).collect()
    val total = Tables.events(spark, TestSpark.sf0001).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("attribution: matches a per-user replay of the carry-forward rule") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        when(col("value").isNotNull && !isnan(col("value")),
          (col("value") * lit(100.0)).cast("bigint")).as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val expected = ev
      .groupBy(_._1)
      .toSeq
      .flatMap { case (_, rows) =>
        var chan: String = null
        rows.sortBy(r => (r._2, r._3)).flatMap { case (_, _, _, tpe, cents) =>
          if (tpe == "click" || tpe == "view") chan = tpe
          if (tpe == "purchase") Some((if (chan == null) "none" else chan, cents)) else None
        }
      }
      .groupBy(_._1)
      .map { case (c, xs) =>
        (c, xs.size.toLong, xs.flatMap(_._2) match {
          case Nil => None; case vs => Some(vs.sum)
        })
      }
      .toSet
    val got = EventsQueries.queries("attribution")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    assert(got == expected)
  }

  test("events_twap: constant series has TWAP == the constant; weights are the gaps") {
    val rows = EventsQueries.queries("events_twap")(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getDouble(3) > 0.0, "cents TWAP positive on this fixture")
    }
    // exact replay on a constructed series: value 3.00 held 10 us, then
    // 5.00 held 30 us within one day -> twap = (300*10 + 500*30)/40
    val fix = Seq(
      (1L, 0L, "x", 3.0), (2L, 10L, "x", 5.0), (3L, 40L, "x", 7.0))
      .toDF("event_id", "ts_us", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), expr("ts_us DIV 86400000000"))
      .orderBy(col("ts_us"), col("event_id"))
    val got = fix
      .select(col("event_type"), col("event_id"), col("ts_us"),
        (col("value") * lit(100.0)).cast("bigint").as("cents"))
      .withColumn("gap_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg((sum(col("cents") * col("gap_us")).cast("double") /
        sum(col("gap_us")).cast("double")).as("twap"))
      .head().getDouble(1)
    assert(got == (300.0 * 10 + 500.0 * 30) / 40.0)
  }

  test("rolling_7d: equals a replayed trailing-7-day value window") {
    val got = EventsQueries.queries("rolling_7d")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val days = got.map(_._1)
    val perDay = EventsQueries.queries("rolling_7d")(spark, TestSpark.sf0001)
      .select(col("day"), col("n_events"), col("rev_c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    got.zip(days).foreach { case ((d, n7, r7), _) =>
      val in = perDay.filter(p => p._1 >= d - 6 && p._1 <= d)
      assert(n7 == in.map(_._2).sum, s"day $d trailing count")
      val revs = in.flatMap(_._3)
      assert(r7 == (if (revs.isEmpty) None else Some(revs.sum)), s"day $d trailing revenue")
    }
  }

  // --- corpus curves + graph + FK audit ------------------------------

  test("vocab_growth: cumulative curve is monotone and ends at the vocabulary size") {
    val rows = TextQueries.queries("vocab_growth")(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.drop(1)).forall { case (a, b) => a <= b })
    assert(rows.map(_.getLong(1)).sum == cums.last, "new terms sum to the final vocabulary")
    val vocab = graft.operators.DedupOps
      .shingleRows(Tables.documents(spark, TestSpark.sf0001), 3)
      .select(col("h")).distinct().count()
    assert(cums.last == vocab)
  }

  test("graph_degree_hist: node count conserved, degree mass = 2 × edges") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rows = DedupQueries.queries("graph_degree_hist")(spark, TestSpark.sf0001).collect()
    assert(rows.map(_.getLong(1)).sum == docs.count(), "every doc appears once")
    val pairCount = graft.operators.DedupOps
      .jaccardPairs(docs, n = 3, minJaccard = 0.5).count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == 2L * pairCount)
  }

  test("fk_orphans: the star schema is referentially clean, child counts exact") {
    val rows = TpchQueries.queries("fk_orphans")(spark, TestSpark.sf0001).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getLong(2) == 0L, s"${r.getString(0)} has orphans"))
    val li = Tables.lineitem(spark, TestSpark.sf0001).count()
    val ord = Tables.orders(spark, TestSpark.sf0001).count()
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("lineitem.l_orderkey->orders") == li)
    assert(m("orders.o_custkey->customer") == ord)
  }
}
