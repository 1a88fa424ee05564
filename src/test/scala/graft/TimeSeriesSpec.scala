package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

/** TimeSeriesOps.ewmaLast: truncated-EWMA recurrence checked against a
  * driver-side sequential fold, plus the contract edges (short series,
  * NaN filtering, exact dyadic arithmetic).
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, Long, Long, Double)]) =
    rows
      .toDF("user_id", "event_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))

  /** Reference: the same K-lag weighted mean, folded sequentially. */
  private def refEwma(values: Seq[Double], k: Int = 8): Double = {
    val cents = values.map(v => (v * 100.0).toLong)
    val window = cents.takeRight(k).reverse // j=0 is the newest
    val num = window.zipWithIndex.map { case (c, j) => c << (k - 1 - j) }.sum
    val den = window.zipWithIndex.map { case (_, j) => 1L << (k - 1 - j) }.sum
    num.toDouble / den.toDouble
  }

  test("ewmaLast matches a sequential fold on a multi-user series") {
    val rows = for {
      u <- 1L to 5L
      i <- 1L to 20L
    } yield (u, u * 100 + i, i * 1000000L, (u * 7 + i * 3 % 11).toDouble + 0.25)
    val got = TimeSeriesOps
      .ewmaLast(eventsDf(rows))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    for (u <- 1L to 5L) {
      val vals = rows.filter(_._1 == u).sortBy(_._3).map(_._4)
      val (n, ewma) = got(u)
      assert(n == 20)
      assert(math.abs(ewma - refEwma(vals)) < 1e-6, s"user $u")
    }
  }

  test("series shorter than the lookback uses only the available lags") {
    val rows = Seq((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 40.0))
    val r = TimeSeriesOps.ewmaLast(eventsDf(rows)).collect()(0)
    // weights newest-first: 128, 64, 32 on cents 4000, 2000, 1000
    val expect = (4000L * 128 + 2000L * 64 + 1000L * 32).toDouble / (128 + 64 + 32).toDouble
    assert(r.getLong(1) == 3)
    assert(r.getLong(2) == 4000L)
    assert(math.abs(r.getDouble(3) - expect) < 1e-9)
  }

  test("null and NaN values are filtered before lagging") {
    val rows = eventsDf(Seq((1L, 1L, 1L, 10.0), (1L, 3L, 3L, 30.0)))
      .unionByName(
        Seq((1L, 2L, 2L)).toDF("user_id", "event_id", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .withColumn("value", lit(Double.NaN)))
    val r = TimeSeriesOps.ewmaLast(rows).collect()(0)
    assert(r.getLong(1) == 2) // the NaN row is gone
    val expect = (3000L * 128 + 1000L * 64).toDouble / (128 + 64).toDouble
    assert(math.abs(r.getDouble(3) - expect) < 1e-6) // output is round(·, 6)
  }

  test("single-event series: ewma equals the value itself") {
    val r = TimeSeriesOps.ewmaLast(eventsDf(Seq((9L, 1L, 5L, 12.34)))).collect()(0)
    assert(r.getLong(2) == 1234L)
    assert(r.getDouble(3) == 1234.0)
  }

  private def dailyDf(revByDay: Seq[(Int, Double)]) =
    revByDay.zipWithIndex
      .map { case ((d, v), i) =>
        (1L, i.toLong, d.toLong * 86400L * 1000000L, v)
      }
      .toDF("user_id", "event_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))

  test("holtForecast on a perfectly linear series extrapolates the line EXACTLY") {
    // daily revenue 100, 200, ..., 1000 cents: every diff is 100 → trend
    // EWMA = 100 exactly; the center-of-mass drift correction makes the
    // h-step forecast the true line continuation 1000 + 100·h.
    val days = (1 to 10).map(d => d -> d.toDouble) // d dollars = 100d cents
    val out = TimeSeriesOps.holtForecast(dailyDf(days)).collect()
    assert(out.length == 7)
    val levels = (0 until 8).map(j => (10 - j) * 100L) // newest-first cents
    val num = levels.zipWithIndex.map { case (c, j) => c << (7 - j) }.sum
    val level = num.toDouble / 255.0
    out.foreach { r =>
      val h = r.getInt(0)
      assert(r.getDouble(2) == 100.0, "trend must be exactly the slope")
      assert(math.abs(r.getDouble(1) - level) < 1e-6)
      assert(math.abs(r.getDouble(3) - (1000.0 + h * 100.0)) < 1e-6, s"h=$h")
    }
  }

  test("centerOffset: exact dyadic centers for the two lag layouts") {
    assert(TimeSeriesOps.centerOffset(8, 0) == (247L, 255L))
    assert(TimeSeriesOps.centerOffset(8, 1) == (502L, 255L))
    assert(TimeSeriesOps.centerOffset(1, 0) == (0L, 1L))
  }

  test("holtForecast single-day series: null trend, forecast equals level") {
    val out = TimeSeriesOps.holtForecast(dailyDf(Seq(3 -> 5.0))).collect()
    out.foreach { r =>
      assert(r.isNullAt(2))
      assert(r.getDouble(1) == 500.0 && r.getDouble(3) == 500.0)
    }
  }

  test("holtForecast on a constant series: zero trend, level equals the constant") {
    val out = TimeSeriesOps.holtForecast(dailyDf((1 to 20).map(d => d -> 7.0))).collect()
    out.foreach { r =>
      assert(r.getDouble(2) == 0.0)
      assert(r.getDouble(3) == 700.0)
    }
  }

  test("theilSen recovers the exact slope of a linear series") {
    // 5 cents/day ramp over 15 days: every pairwise slope is 500 nano-scaled
    val r = TimeSeriesOps.theilSen(dailyDf((1 to 15).map(d => d -> (5.0 * d)))).collect()(0)
    assert(r.getLong(0) == 15 && r.getLong(1) == 15 * 14 / 2)
    assert(r.getLong(2) == 500L * 1000000000L / 1000000000L * 1000000000L || r.getLong(2) == 500000000000L)
    assert(r.getDouble(3) == 500.0)
    assert(r.getDouble(4) == 500.0) // intercept at x=0 (first day) = first value
  }

  test("theilSen shrugs off a single corrupted day (OLS would not)") {
    val clean = (1 to 20).map(d => d -> (2.0 * d))
    val dirty = clean.updated(9, 10 -> 100000.0) // one wild outlier
    val r = TimeSeriesOps.theilSen(dailyDf(dirty)).collect()(0)
    assert(r.getDouble(3) == 200.0, s"median slope must stay 200, got ${r.getDouble(3)}")
  }

  test("theilSen handles calendar gaps by true day distance") {
    // days 1 and 11, values 0 and 100 dollars: slope = 1000 cents/day
    val r = TimeSeriesOps.theilSen(dailyDf(Seq(1 -> 0.0, 11 -> 100.0))).collect()(0)
    assert(r.getLong(1) == 1)
    assert(r.getDouble(3) == 1000.0)
  }

  test("ewmaAnomalies flags an injected spike and nothing else on noisy-flat data") {
    // alternating 100/102 dollars, one 500-dollar day in the middle
    val days = (1 to 30).map(d => d -> (if (d == 20) 500.0 else if (d % 2 == 0) 102.0 else 100.0))
    val out = TimeSeriesOps.ewmaAnomalies(dailyDf(days)).collect()
    val flagged = out.map(_.getTimestamp(0).toInstant.getEpochSecond / 86400).toSet
    assert(flagged.contains(20L), s"spike day must be flagged, got $flagged")
    assert(!flagged.contains(10L) && !flagged.contains(25L))
    // day 21 may legitimately flag too (the spike inflated its baseline
    // deviation but also shifted the level); the spike itself must be first
    assert(out.head.getLong(1) == 50000L)
  }

  test("ewmaAnomalies on a constant series: zero deviation, zero anomalies") {
    val out = TimeSeriesOps.ewmaAnomalies(dailyDf((1 to 15).map(d => d -> 7.0))).collect()
    assert(out.isEmpty) // |y·den − num| = 0 is never > 0 = dev_sum
  }

  test("ewmaAnomalies: first day has no baseline and cannot flag") {
    val out = TimeSeriesOps.ewmaAnomalies(dailyDf(Seq(1 -> 9999.0, 2 -> 1.0, 3 -> 1.0))).collect()
    val flagged = out.map(_.getTimestamp(0).toInstant.getEpochSecond / 86400).toSet
    assert(!flagged.contains(1L))
  }

  test("forecastBacktest: constant series → all models perfect, MASE null (0/0)") {
    val r = TimeSeriesOps.forecastBacktest(dailyDf((1 to 20).map(d => d -> 5.0))).collect()(0)
    assert(r.getLong(0) == 13) // 20 days − 7 warmup
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("forecastBacktest: on a linear ramp Holt beats naive (MASE < 1)") {
    val r = TimeSeriesOps
      .forecastBacktest(dailyDf((1 to 30).map(d => d -> (10.0 * d))))
      .collect()(0)
    assert(r.getLong(0) == 23)
    // naive is off by the slope every day; Holt tracks the line exactly
    // once the window fills (the one warmup day with 7 of 8 lags carries
    // the full residual MAE)
    assert(r.getDouble(1) == 1000.0, s"naive MAE ${r.getDouble(1)}")
    assert(r.getDouble(3) < 2.0, s"holt MAE ${r.getDouble(3)}")
    assert(r.getDouble(4) < 0.005, s"mase_holt ${r.getDouble(4)}")
    // seasonal-naive is off by 7 slopes
    assert(r.getDouble(5) > 6.9 && r.getDouble(5) < 7.1)
  }

  test("forecastBacktest: fewer than season+1 days → empty eval set") {
    val r = TimeSeriesOps.forecastBacktest(dailyDf((1 to 7).map(d => d -> 1.0))).collect()(0)
    assert(r.getLong(0) == 0)
  }

  test("holtSeasonalForecast recovers injected weekday offsets exactly") {
    // constant 100-dollar base + a zero-sum weekday pattern over 6 weeks:
    // the MA7 detrend isolates the offsets, so seasonal_c == offset(dow)
    val offs = Map(1 -> 6.0, 2 -> -2.0, 3 -> 1.0, 4 -> -4.0, 5 -> 3.0, 6 -> -5.0, 7 -> 1.0)
    val days = (0 until 42).map { i =>
      val epochDay = 19000 + i // day 19000 epoch; dow = ((19000+i)+3) % 7 + 1
      val dow = ((epochDay + 3) % 7 + 1).toInt
      (epochDay, 100.0 + offs(dow))
    }
    val df = days.zipWithIndex.map { case ((d, v), ix) =>
      (1L, ix.toLong, d.toLong * 86400L * 1000000L, v)
    }.toDF("user_id", "event_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val out = TimeSeriesOps.holtSeasonalForecast(df).collect()
    assert(out.length == 7)
    out.foreach { r =>
      val dow = r.getInt(1)
      assert(math.abs(r.getDouble(3) - offs(dow) * 100.0) < 1e-4,
        s"dow $dow seasonal ${r.getDouble(3)} vs ${offs(dow) * 100.0}")
      // additivity of the adjusted forecast
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) + r.getDouble(3))) < 2e-6)
    }
  }

  test("holtSeasonalForecast on a constant series: zero index, flat forecast") {
    val out = TimeSeriesOps
      .holtSeasonalForecast(dailyDf((1 to 30).map(d => d -> 42.0)))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(3) == 0.0)
      assert(r.getDouble(4) == 4200.0)
    }
  }
}
