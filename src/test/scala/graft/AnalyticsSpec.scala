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
}
