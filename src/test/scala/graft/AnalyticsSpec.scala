package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Cohort retention, integer-exact anomaly flags, and the Q10 returns
  * query.
  */
class AnalyticsSpec extends SparkSpec {

  test("retention: offset-0 cells are complete cohorts, later cells shrink-bounded") {
    val rows = EventsQueries
      .queries("events_retention")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, n, size, ret) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(off >= 0L && n <= size)
      if (off == 0L) assert(n == size && ret == 1.0, "every user is active in their first week")
    }
  }

  test("anomaly: flagged set equals the integer 2-sigma rule recomputed from hourly counts") {
    val hourly = Tables
      .events(spark, TestSpark.sf0001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val byType = hourly.groupBy(_._1)
    val expected = byType.toSeq.flatMap { case (t, cells) =>
      val n = cells.length.toLong
      val s = cells.map(_._3).sum
      val s2 = cells.map(c => c._3 * c._3).sum
      cells.toSeq.collect {
        case (_, hr, c) if {
              val dev = c * n - s
              dev * dev > 4L * (n * s2 - s * s)
            } =>
          (t, hr)
      }
    }.toSet
    val got = EventsQueries
      .queries("events_anomaly")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
      .toSet
    assert(got == expected, "flag rule is exact — no extra and no missing cells")
    assert(got.nonEmpty, "fixture has 2-sigma hours")
  }

  test("q10: descending revenue, deterministic tie-break, at most 20 customers") {
    val rows = TpchQueries
      .queries("q10_returns")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.sliding(2).foreach {
      case Array((idA, revA), (idB, revB)) =>
        assert(revA > revB || (revA == revB && idA < idB), "(revenue desc, custkey) order")
      case _ => ()
    }
    assert(rows.forall(_._2 > 0L))
  }
  test("q8: market share in [0,1], nation revenue bounded by total, all years present") {
    val rows = TpchQueries.queries("q8_market_share")(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, nation, share) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nation >= 0L && nation <= total)
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - nation.toDouble / total.toDouble) < 1e-6)
    }
  }

  test("minute_gapfill: calendar is dense, gap rows carry forward the last revenue") {
    import spark.implicits._
    val out = EventsQueries.queries("minute_gapfill")(spark, TestSpark.sf0001).collect()
    // dense calendar: row count == minutes between first and last, inclusive
    val mins = out.map(_.getTimestamp(0).getTime / 60000)
    assert(mins.last - mins.head + 1 == out.length)
    assert(mins.sliding(2).forall(p => p(1) == p(0) + 1), "no missing calendar minute")
    // every gap row has zero events and inherits the previous filled value
    out.sliding(2).foreach { w =>
      val (prev, cur) = (w(0), w(1))
      if (cur.getInt(2) == 1) {
        assert(cur.getLong(1) == 0L)
        assert(cur.isNullAt(3), "gap rows have no raw revenue")
        assert(cur.get(4) == prev.get(4), "fill carries the previous value")
      }
    }
    assert(out.exists(_.getInt(2) == 1), "sf0.001 should contain at least one empty minute")
  }

  test("winsorized_stats: thresholds are order statistics, clip counts consistent") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val out = graft.operators.ProfileOps
      .winsorizedStats(li, "l_returnflag", "l_extendedprice")
      .collect()
    val byFlag = li
      .select(col("l_returnflag"), (col("l_extendedprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap
    out.foreach { r =>
      val (g, n, lo, hi) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val vs = byFlag(g)
      assert(n == vs.length)
      assert(lo == vs(((5 * (n - 1)) / 100).toInt) && hi == vs(((95 * (n - 1)) / 100).toInt))
      assert(r.getLong(4) == vs.count(_ < lo) && r.getLong(5) == vs.count(_ > hi))
      val mean = BigDecimal(vs.map(v => math.max(lo, math.min(hi, v))).sum) / n / 100
      assert(r.getDouble(6) == mean.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("transition_entropy equals a replay over the transition counts") {
    val got = SparkEntry.queries("transition_entropy")(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    val tc = SparkEntry.queries("events_transitions")(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = tc.groupBy(_._1).map { case (prev, rows) =>
      val tot = rows.map(_._3).sum
      val nano = rows.map { case (_, _, n) =>
        n * math.round(math.log(tot.toDouble / n) * 1e9)
      }.sum
      val ent = BigDecimal(nano.toDouble / tot.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val top = rows.minBy { case (_, next, n) => (-n, next) }._2
      prev -> ((tot, rows.size.toLong, ent, top))
    }
    assert(got == want)
    // entropy of a k-way distribution is bounded by ln k
    got.foreach { case (_, (_, k, e, _)) =>
      assert(e >= 0.0 && e <= math.log(k.toDouble) + 1e-6)
    }
  }
}
