package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.operators.EvalOps

/** Brute-force replays of the EvalOps audits: every operator is re-derived
  * in plain Scala on the SAME quantized/gridded inputs and compared within
  * the operator's own 6-decimal rounding (|got − brute| ≤ 1e-6 — `got` is
  * round(brute, 6), so the gap can't exceed half an ulp of the grid).
  */
class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val Bins = 256

  /** The operator's grid: (c − min)·bins DIV (max − min + 1), floor toward
    * −∞ is irrelevant because the numerator is ≥ 0 by construction.
    */
  private def grid(cs: Seq[Long], bins: Int): Seq[Long] = {
    val mn = cs.min; val mx = cs.max
    cs.map(c => (c - mn) * bins / (mx - mn + 1))
  }

  test("binnedAuc == brute-force pair counting on the gridded scores") {
    val row = for {
      c <- Gen.chooseNum(-5000L, 5000L)
      y <- Gen.oneOf(0L, 1L)
    } yield (c, y)
    val gen = Gen.nonEmptyListOf(row)
      .suchThat(l => l.exists(_._2 == 1L) && l.exists(_._2 == 0L))
    check(Prop.forAllNoShrink(gen) { rows: List[(Long, Long)] =>
      val df = rows.toDF("c", "y")
      val got = EvalOps.binnedAuc(df, col("c"), col("y"), Bins).head()
      val bins = grid(rows.map(_._1), Bins)
      val binned = bins.zip(rows.map(_._2))
      val pos = binned.filter(_._2 == 1L).map(_._1)
      val neg = binned.filter(_._2 == 0L).map(_._1)
      val u = (for (p <- pos; n <- neg) yield {
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0
      }).sum
      val brute = u / (pos.size.toDouble * neg.size.toDouble)
      got.getLong(0) == pos.size && got.getLong(1) == neg.size &&
      math.abs(got.getDouble(2) - brute) <= 1e-6
    }, n = 25)
  }

  test("binnedAuc: all-tied scores give exactly 0.5") {
    val df = Seq((7L, 1L), (7L, 0L), (7L, 1L), (7L, 0L)).toDF("c", "y")
    val r = EvalOps.binnedAuc(df, col("c"), col("y")).head()
    assert(r.getDouble(2) == 0.5)
  }

  test("calibrationTable == brute-force reliability table + ECE") {
    val row = for {
      pm <- Gen.chooseNum(0L, 1000000L)
      y <- Gen.oneOf(0L, 1L)
    } yield (pm, y)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Long, Long)] =>
      val df = rows.toDF("pm", "y")
      val got = EvalOps.calibrationTable(df, col("pm"), col("y")).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      val n = rows.size.toDouble
      val byBin = rows.groupBy { case (pm, _) => math.min(pm / 100000L, 9L) }
      byBin.forall { case (bin, rs) =>
        val (cnt, npos, sumpm) = (rs.size.toLong, rs.map(_._2).sum, rs.map(_._1).sum)
        val (gn, gp, conf, acc, ece) = got(bin)
        gn == cnt && gp == npos &&
        math.abs(conf - sumpm.toDouble / (cnt * 1000000.0)) <= 1e-6 &&
        math.abs(acc - npos.toDouble / cnt) <= 1e-6 &&
        math.abs(ece - math.abs(npos * 1000000L - sumpm).toDouble / (1000000.0 * n)) <= 1e-6
      } && got.keySet == byBin.keySet
    }, n = 25)
  }

  test("binnedAucCi == brute-force DeLong on the gridded scores") {
    val row = for {
      c <- Gen.chooseNum(-5000L, 5000L)
      y <- Gen.oneOf(0L, 1L)
    } yield (c, y)
    val gen = Gen.nonEmptyListOf(row)
      .suchThat(l => l.count(_._2 == 1L) >= 2 && l.count(_._2 == 0L) >= 2)
    check(Prop.forAllNoShrink(gen) { rows: List[(Long, Long)] =>
      val df = rows.toDF("c", "y")
      val r = graft.operators.EvalOps.binnedAucCi(df, col("c"), col("y"), Bins).head()
      val bins = grid(rows.map(_._1), Bins).zip(rows.map(_._2))
      val pos = bins.filter(_._2 == 1L).map(_._1)
      val neg = bins.filter(_._2 == 0L).map(_._1)
      val nP = pos.size.toDouble; val nN = neg.size.toDouble
      val auc = (for (p <- pos; q <- neg)
        yield { if (p > q) 1.0 else if (p == q) 0.5 else 0.0 }).sum / (nP * nN)
      // per-observation placement values (constant within a bin)
      val v = pos.map(p => (neg.count(_ < p) + 0.5 * neg.count(_ == p)) / nN)
      val w = neg.map(q => (pos.count(_ > q) + 0.5 * pos.count(_ == q)) / nP)
      val s10 = v.map(x => (x - auc) * (x - auc)).sum / (nP - 1)
      val s01 = w.map(x => (x - auc) * (x - auc)).sum / (nN - 1)
      val se = math.sqrt(s10 / nP + s01 / nN)
      r.getLong(0) == pos.size && r.getLong(1) == neg.size &&
      math.abs(r.getDouble(2) - auc) <= 1e-6 &&
      math.abs(r.getDouble(3) - se) <= 1e-5 &&
      math.abs(r.getDouble(4) - math.max(auc - 1.959964 * se, 0.0)) <= 2e-5 &&
      math.abs(r.getDouble(5) - math.min(auc + 1.959964 * se, 1.0)) <= 2e-5 &&
      r.getDouble(4) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(5)
    }, n = 25)
  }

  test("binnedAucBy == per-group brute force; single-class groups get NULL") {
    val row = for {
      g <- Gen.oneOf("a", "b", "c")
      c <- Gen.chooseNum(-5000L, 5000L)
      y <- Gen.oneOf(0L, 1L)
    } yield (g, c, y)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(String, Long, Long)] =>
      val df = rows.toDF("g", "c", "y")
      val got = EvalOps.binnedAucBy(df, "g", col("c"), col("y"), Bins).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toMap
      val byG = rows.groupBy(_._1)
      byG.forall { case (gk, rs) =>
        val bins = grid(rs.map(_._2), Bins).zip(rs.map(_._3))
        val pos = bins.filter(_._2 == 1L).map(_._1)
        val neg = bins.filter(_._2 == 0L).map(_._1)
        val (gp, gn, ga) = got(gk)
        val countsOk = gp == pos.size && gn == neg.size
        if (pos.isEmpty || neg.isEmpty) countsOk && ga.isEmpty
        else {
          val u = (for (p <- pos; n <- neg) yield {
            if (p > n) 1.0 else if (p == n) 0.5 else 0.0
          }).sum
          countsOk && ga.exists(a =>
            math.abs(a - u / (pos.size.toDouble * neg.size.toDouble)) <= 1e-6)
        }
      } && got.keySet == byG.keySet
    }, n = 25)
  }

  test("liftCurve == brute-force cumulative gains, best bin first") {
    val row = for {
      pm <- Gen.chooseNum(0L, 1000000L)
      y <- Gen.oneOf(0L, 1L)
    } yield (pm, y)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Long, Long)] =>
      val df = rows.toDF("pm", "y")
      val got = EvalOps.liftCurve(df, col("pm"), col("y")).collect()
      val byBin = rows.groupBy { case (pm, _) => math.min(pm / 100000L, 9L) }
      val ordered = byBin.toSeq.sortBy(-_._1)
      val nt = rows.size.toDouble
      val pt = rows.map(_._2).sum.toDouble
      var cumN = 0L; var cumP = 0L
      val descOrderOk = got.map(_.getLong(0)).toSeq == ordered.map(_._1)
      descOrderOk && got.zip(ordered).forall { case (r, (bin, rs)) =>
        cumN += rs.size; cumP += rs.map(_._2).sum
        val baseOk = r.getLong(0) == bin && r.getLong(1) == rs.size &&
          r.getLong(2) == rs.map(_._2).sum &&
          r.getLong(3) == cumN && r.getLong(4) == cumP
        if (pt == 0) baseOk && r.isNullAt(5) && r.isNullAt(6)
        else baseOk &&
          math.abs(r.getDouble(5) - cumP / pt) <= 1e-6 &&
          math.abs(r.getDouble(6) - cumP * nt / (cumN * pt)) <= 1e-6
      }
    }, n = 25)
  }

  test("psiContributions == brute-force smoothed PSI terms") {
    val row = for {
      c <- Gen.chooseNum(-10000L, 10000L)
      a <- Gen.oneOf(0L, 1L)
    } yield (c, a)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Long, Long)] =>
      val bins = 16
      val df = rows.toDF("c", "a")
      val got = EvalOps.psiContributions(df, col("c"), col("a"), bins).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      val binned = grid(rows.map(_._1), bins).zip(rows.map(_._2))
      val te = rows.count(_._2 == 1L).toDouble
      val tl = rows.size - te
      val byBin = binned.groupBy(_._1)
      byBin.forall { case (bin, rs) =>
        val ne = rs.count(_._2 == 1L); val nl = rs.size - ne
        val pe = (ne + 0.5) / (te + bins * 0.5)
        val pl = (nl + 0.5) / (tl + bins * 0.5)
        val brute = (pl - pe) * math.log(pl / pe)
        val (ge, gl, gc) = got(bin)
        ge == ne && gl == nl && math.abs(gc - brute) <= 1e-6
      } && got.keySet == byBin.keySet
    }, n = 25)
  }

  test("brierDecomposition == brute-force Murphy decomposition") {
    val row = for {
      pm <- Gen.chooseNum(0L, 1000000L)
      y <- Gen.oneOf(0L, 1L)
    } yield (pm, y)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Long, Long)] =>
      val df = rows.toDF("pm", "y")
      val r = graft.operators.EvalOps.brierDecomposition(df, col("pm"), col("y")).head()
      val n = rows.size.toDouble
      val brier = rows.map { case (pm, y) =>
        val d = pm / 1e6 - y; d * d
      }.sum / n
      val yBar = rows.map(_._2).sum / n
      val byBin = rows.groupBy { case (pm, _) => math.min(pm / 100000L, 9L) }
      val rel = byBin.values.map { rs =>
        val pb = rs.map(_._1).sum / (rs.size * 1e6)
        val yb = rs.map(_._2).sum.toDouble / rs.size
        rs.size * (pb - yb) * (pb - yb)
      }.sum / n
      val res = byBin.values.map { rs =>
        val yb = rs.map(_._2).sum.toDouble / rs.size
        rs.size * (yb - yBar) * (yb - yBar)
      }.sum / n
      val unc = yBar * (1 - yBar)
      r.getLong(0) == rows.size &&
      math.abs(r.getDouble(1) - brier) <= 1e-6 &&
      math.abs(r.getDouble(2) - rel) <= 1e-5 &&
      math.abs(r.getDouble(3) - res) <= 1e-5 &&
      math.abs(r.getDouble(4) - unc) <= 1e-6 &&
      // residual = within-bin Var(p) − 2·Cov(p, y); sign-indefinite
      math.abs(r.getDouble(5) - (brier - (rel - res + unc))) <= 2e-5
    }, n = 25)
  }

  test("psiContributionsBy == per-group ungrouped psiContributions on each slice") {
    val row = for {
      g <- Gen.oneOf("a", "b")
      c <- Gen.chooseNum(-8000L, 8000L)
      a <- Gen.oneOf(0L, 1L)
    } yield (g, c, a)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(String, Long, Long)] =>
      val df = rows.toDF("g", "c", "a")
      val got = graft.operators.EvalOps.psiContributionsBy(df, "g", col("c"), col("a"))
        .collect().groupBy(_.getString(0))
      rows.map(_._1).distinct.forall { gk =>
        val slice = rows.filter(_._1 == gk).map(t => (t._2, t._3)).toDF("c", "a")
        val ungrouped = graft.operators.EvalOps.psiContributions(slice, col("c"), col("a"))
          .collect().map(_.toSeq)
        got(gk).map(_.toSeq.drop(1)).toSeq == ungrouped.toSeq
      }
    }, n = 20)
  }

  test("binnedKendallTau == brute-force tau-b on the gridded pairs") {
    val kb = 16
    val row = for {
      x <- Gen.chooseNum(-500L, 500L)
      y <- Gen.chooseNum(-500L, 500L)
    } yield (x, y)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Long, Long)] =>
      val df = rows.toDF("x", "y")
      val r = graft.operators.EvalOps.binnedKendallTau(df, col("x"), col("y"), kb).head()
      val bx = grid(rows.map(_._1), kb)
      val by = grid(rows.map(_._2), kb)
      val pts = bx.zip(by)
      var conc = 0L; var disc = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.size) {
        val s = (pts(i)._1 - pts(j)._1) * (pts(i)._2 - pts(j)._2)
        if (s > 0) conc += 1 else if (s < 0) disc += 1
      }
      val n = pts.size.toLong
      val tx2 = bx.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1)).sum
      val ty2 = by.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1)).sum
      val n2 = n * (n - 1)
      val base = r.getLong(0) == n && r.getLong(1) == conc && r.getLong(2) == disc
      if (n2 <= tx2 || n2 <= ty2) base && r.isNullAt(3)
      else {
        val tau = 2.0 * (conc - disc) / math.sqrt((n2 - tx2).toDouble * (n2 - ty2).toDouble)
        base && math.abs(r.getDouble(3) - tau) <= 1e-6
      }
    }, n = 20)
  }

  test("binnedKendallTau: perfect agreement gives tau_b = 1") {
    val df = (1L to 40L).map(i => (i, i * 3)).toDF("x", "y")
    val r = graft.operators.EvalOps.binnedKendallTau(df, col("x"), col("y"), 64).head()
    assert(r.getDouble(3) == 1.0)
  }

  test("binnedAucCompare == cell-wise paired-DeLong replay on the gridded scores") {
    val kb = 16
    val row = for {
      x <- Gen.chooseNum(-300L, 300L)
      z <- Gen.chooseNum(-300L, 300L)
      y <- Gen.oneOf(0, 1)
    } yield (x, z, y)
    // at least one of each class so the AUCs are defined
    val gen = Gen.nonEmptyListOf(row).map(rs => (5L, -5L, 1) :: (-5L, 5L, 0) :: rs)
    def nano(x: Double): Long =
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    check(Prop.forAllNoShrink(gen) { rows: List[(Long, Long, Int)] =>
      val df = rows.toDF("s1", "s2", "y")
      val r = graft.operators.EvalOps
        .binnedAucCompare(df, col("s1"), col("s2"), col("y"), kb).head()
      val b1 = grid(rows.map(_._1), kb)
      val b2 = grid(rows.map(_._2), kb)
      val ys = rows.map(_._3)
      val items = b1.lazyZip(b2).lazyZip(ys).toList
      val p = ys.count(_ == 1).toLong
      val nn = ys.count(_ == 0).toLong
      def marg(bs: Seq[Long]): (Map[Long, Long], Map[Long, Long]) = {
        val mp = bs.zip(ys).filter(_._2 == 1).groupBy(_._1)
          .map { case (b, g) => b -> g.size.toLong }
        val mn = bs.zip(ys).filter(_._2 == 0).groupBy(_._1)
          .map { case (b, g) => b -> g.size.toLong }
        (mp, mn)
      }
      val (mp1, mn1) = marg(b1); val (mp2, mn2) = marg(b2)
      def below(m: Map[Long, Long], b: Long) = m.filter(_._1 < b).values.sum
      def above(m: Map[Long, Long], b: Long) = m.filter(_._1 > b).values.sum
      def u2(mp: Map[Long, Long], mn: Map[Long, Long]): Long =
        (mp.keySet ++ mn.keySet).toSeq.map { b =>
          mp.getOrElse(b, 0L) * (2 * below(mn, b) + mn.getOrElse(b, 0L))
        }.sum
      val a1 = u2(mp1, mn1).toDouble / (2.0 * p * nn)
      val a2 = u2(mp2, mn2).toDouble / (2.0 * p * nn)
      def v(mn: Map[Long, Long], b: Long) =
        (2.0 * below(mn, b) + mn.getOrElse(b, 0L)) / (2.0 * nn)
      def w(mp: Map[Long, Long], b: Long) =
        (2.0 * above(mp, b) + mp.getOrElse(b, 0L)) / (2.0 * p)
      val cells = items.groupBy(t => (t._1, t._2)).map { case ((c1, c2), g) =>
        (c1, c2, g.count(_._3 == 1).toLong, g.count(_._3 == 0).toLong)
      }
      var s1011, s1022, s1012, s0111, s0122, s0112 = 0L
      cells.foreach { case (c1, c2, np, ng) =>
        val (v1, v2) = (v(mn1, c1), v(mn2, c2))
        val (w1, w2) = (w(mp1, c1), w(mp2, c2))
        s1011 += nano(np * (v1 - a1) * (v1 - a1))
        s1022 += nano(np * (v2 - a2) * (v2 - a2))
        s1012 += nano(np * (v1 - a1) * (v2 - a2))
        s0111 += nano(ng * (w1 - a1) * (w1 - a1))
        s0122 += nano(ng * (w2 - a2) * (w2 - a2))
        s0112 += nano(ng * (w1 - a1) * (w2 - a2))
      }
      val varD =
        ((s1011 + s1022 - 2 * s1012).toDouble / (1e9 * (p - 1.0))) / p +
          ((s0111 + s0122 - 2 * s0112).toDouble / (1e9 * (nn - 1.0))) / nn
      val base = r.getLong(0) == p && r.getLong(1) == nn &&
        math.abs(r.getDouble(2) - a1) <= 1e-6 &&
        math.abs(r.getDouble(3) - a2) <= 1e-6 &&
        math.abs(r.getDouble(4) - (a1 - a2)) <= 1e-6
      val okSe =
        if (p <= 1 || nn <= 1 || varD < 0) r.isNullAt(5)
        else math.abs(r.getDouble(5) - math.sqrt(varD)) <= 1e-6
      val okZ =
        if (p <= 1 || nn <= 1 || varD <= 0) r.isNullAt(6)
        else math.abs(r.getDouble(6) - (a1 - a2) / math.sqrt(varD)) <= 1e-5
      base && okSe && okZ
    }, n = 20)
  }

  test("binnedAucCompare of a score against itself: d_auc = 0, z undefined") {
    val df = Seq((10L, 10L, 1), (3L, 3L, 0), (7L, 7L, 1), (1L, 1L, 0))
      .toDF("s1", "s2", "y")
    val r = graft.operators.EvalOps
      .binnedAucCompare(df, col("s1"), col("s2"), col("y"), 16).head()
    assert(r.getDouble(4) == 0.0 && r.isNullAt(6) && r.getDouble(5) == 0.0)
  }

  test("integerAcf == brute-force mean-centered autocorrelation replay") {
    val row = for {
      k <- Gen.chooseNum(1, 25)
      x <- Gen.chooseNum(-500L, 500L)
    } yield (k, x)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Int, Long)] =>
      val maxLag = 4
      val df = rows.toDF("k", "x")
      val res = graft.operators.EvalOps
        .integerAcf(df, col("k"), col("x"), maxLag).collect()
      val series = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
        .toSeq.sortBy(_._1).map(_._2)
      val n = series.size
      val tot = series.sum
      val d = series.map(x => BigInt(n) * x - tot)
      val den = d.map(v => v * v).sum
      (1 to maxLag).zip(res).forall { case (lag, r) =>
        val pairs = d.dropRight(lag).zip(d.drop(lag))
        val num = pairs.map { case (a, b) => a * b }.sum
        val base = r.getInt(0) == lag && r.getLong(1) == pairs.size.toLong
        if (den == 0 || pairs.isEmpty) base && r.isNullAt(2)
        else base &&
          math.abs(r.getDouble(2) - (BigDecimal(num) / BigDecimal(den)).toDouble) <= 1e-6
      }
    }, n = 20)
  }

  test("integerAcf: a strictly alternating series has acf(1) < 0 < acf(2)") {
    val df = (1 to 40).map(i => (i, if (i % 2 == 0) 100L else -100L)).toDF("k", "x")
    val r = graft.operators.EvalOps.integerAcf(df, col("k"), col("x"), 2).collect()
    assert(r(0).getDouble(2) < 0 && r(1).getDouble(2) > 0)
  }

  test("kmSurvival == brute-force product-limit replay with censoring") {
    def nano(x: Double): Long =
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val row = for {
      t <- Gen.chooseNum(0L, 10L)
      e <- Gen.oneOf(0L, 1L)
    } yield (t, e)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Long, Long)] =>
      val df = rows.toDF("t", "ev")
      val res = graft.operators.EvalOps.kmSurvival(df, col("t"), col("ev")).collect()
      val byT = rows.groupBy(_._1).map { case (t, g) =>
        t -> (g.count(_._2 == 1L).toLong, g.count(_._2 == 0L).toLong)
      }.toSeq.sortBy(_._1)
      var remaining = rows.size.toLong
      var cum = 0L
      var dead = false
      val want = byT.map { case (t, (d, c)) =>
        val r = remaining
        remaining -= d + c
        if (d > 0 && d >= r) dead = true
        if (!dead && d > 0) cum += nano(math.log(1.0 - d.toDouble / r))
        (t, r, d, c, if (dead) None else Some(cum / 1e9))
      }
      res.length == want.length && res.zip(want).forall {
        case (row0, (t, r, d, c, ls)) =>
          val base = row0.getLong(0) == t && row0.getLong(1) == r &&
            row0.getLong(2) == d && row0.getLong(3) == c
          ls match {
            case None => base && row0.isNullAt(4)
            case Some(v) => base && math.abs(row0.getDouble(4) - v) <= 1e-6
          }
      }
    }, n = 20)
  }

  test("kmSurvival: no censoring and all events at one time kills the curve there") {
    val df = Seq((3L, 1L), (3L, 1L), (3L, 1L)).toDF("t", "ev")
    val r = graft.operators.EvalOps.kmSurvival(df, col("t"), col("ev")).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.isNullAt(4))
  }

  test("cusumChangepoint == brute-force argmax |CUSUM| replay") {
    val row = for {
      k <- Gen.chooseNum(1, 30)
      x <- Gen.chooseNum(-500L, 500L)
    } yield (k, x)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Int, Long)] =>
      val df = rows.toDF("k", "x")
      val res = graft.operators.EvalOps
        .cusumChangepoint(df, col("k"), col("x")).collect()
      val series = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
        .toSeq.sortBy(_._1)
      val n = series.size.toLong
      if (n == 1) res.isEmpty
      else {
        val tot = series.map(_._2).sum
        val pre = series.scanLeft(0L)((acc, kv) => acc + kv._2).tail
        val ds = series.indices.dropRight(1).map { idx =>
          val i = idx + 1L
          (series(idx)._1, i, pre(idx), BigInt(n) * pre(idx) - BigInt(i) * tot)
        }
        val (bk, bi, bp, bd) = ds.sortBy { case (k, _, _, d) => (-d.abs, k) }.head
        val r = res.head
        r.getLong(0) == n && r.getInt(1) == bk && r.getLong(2) == bi &&
          math.abs(r.getDouble(3) - bd.abs.toDouble / (n * 100.0)) <= 1e-6 &&
          math.abs(r.getDouble(4) - bp / (bi * 100.0)) <= 1e-6 &&
          math.abs(r.getDouble(5) - (tot - bp).toDouble / ((n - bi) * 100.0)) <= 1e-6 &&
          math.abs(r.getDouble(6) -
            ((tot - bp).toDouble / ((n - bi) * 100.0) - bp / (bi * 100.0))) <= 1e-6
      }
    }, n = 20)
  }

  test("cusumChangepoint finds an obvious level shift at its boundary") {
    val df = ((1 to 10).map(i => (i, 100L)) ++ (11 to 20).map(i => (i, 900L)))
      .toDF("k", "x")
    val r = graft.operators.EvalOps.cusumChangepoint(df, col("k"), col("x")).head()
    assert(r.getInt(1) == 10 && r.getDouble(4) == 1.0 && r.getDouble(5) == 9.0)
  }

  test("topkOverlap == brute-force list intersection at every depth") {
    val depths = Seq(2, 5, 10)
    val row = for {
      v1 <- Gen.chooseNum(0L, 20L)
      v2 <- Gen.chooseNum(0L, 20L)
    } yield (v1, v2)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Long, Long)] =>
      val withId = rows.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      val df = withId.toDF("id", "v1", "v2")
      val res = graft.operators.EvalOps
        .topkOverlap(df, "id", col("v1"), col("v2"), depths).collect()
      val top1 = withId.sortBy(t => (-t._2, t._1)).map(_._1)
      val top2 = withId.sortBy(t => (-t._3, t._1)).map(_._1)
      depths.sorted.zip(res).forall { case (d, r) =>
        val a = top1.take(d).toSet
        val b = top2.take(d).toSet
        val common = (a & b).size.toLong
        r.getInt(0) == d && r.getLong(1) == a.size && r.getLong(2) == b.size &&
          r.getLong(3) == common &&
          math.abs(r.getDouble(4) - common.toDouble / math.min(a.size, b.size)) <= 1e-6 &&
          math.abs(r.getDouble(5) - common.toDouble / (a.size + b.size - common)) <= 1e-6
      }
    }, n = 20)
  }

  test("adjustedRandIndex == brute-force pair-counting replay") {
    val row = for {
      a <- Gen.chooseNum(1, 4)
      b <- Gen.chooseNum(1, 3)
    } yield (a, b)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Int, Int)] =>
      val df = rows.toDF("pa", "pb")
      val r = graft.operators.EvalOps.adjustedRandIndex(df, "pa", "pb").head()
      graft.operators.DedupOps.releaseShingleCaches()
      val n = rows.size.toLong
      val cells = rows.groupBy(identity).map { case (_, g) => g.size.toLong }
      val x = cells.map(c => BigInt(c) * (c - 1)).sum
      val aa = rows.groupBy(_._1).map { case (_, g) =>
        BigInt(g.size) * (g.size - 1) }.sum
      val bb = rows.groupBy(_._2).map { case (_, g) =>
        BigInt(g.size) * (g.size - 1) }.sum
      val n2 = BigInt(n) * (n - 1)
      val den = n2 * (aa + bb) - 2 * aa * bb
      val base = r.getLong(0) == n &&
        r.getLong(1) == rows.map(_._1).distinct.size.toLong &&
        r.getLong(2) == rows.map(_._2).distinct.size.toLong
      if (den == 0) base && r.isNullAt(3)
      else base && math.abs(r.getDouble(3) -
        (BigDecimal(2 * (x * n2 - aa * bb)) / BigDecimal(den)).toDouble) <= 1e-6
    }, n = 20)
  }

  test("adjustedRandIndex: identical partitions give ari = 1") {
    val df = Seq((1, 10), (1, 10), (2, 20), (3, 30), (3, 30)).toDF("pa", "pb")
    val r = graft.operators.EvalOps.adjustedRandIndex(df, "pa", "pb").head()
    graft.operators.DedupOps.releaseShingleCaches()
    assert(r.getDouble(3) == 1.0)
  }

  test("nmiFromPartitions == brute-force integer-nano replay") {
    def nano(x: Double): Long =
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val row = for {
      a <- Gen.chooseNum(1, 4)
      b <- Gen.chooseNum(1, 3)
    } yield (a, b)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Int, Int)] =>
      val df = rows.toDF("pa", "pb")
      val r = graft.operators.EvalOps.nmiFromPartitions(df, "pa", "pb").head()
      graft.operators.DedupOps.releaseShingleCaches()
      val n = rows.size.toLong
      val cells = rows.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      val ma = rows.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
      val mb = rows.groupBy(_._2).map { case (k, g) => k -> g.size.toLong }
      val miN = cells.map { case ((a, b), c) =>
        c * nano(math.log(c.toDouble * n / (ma(a).toDouble * mb(b)))) }.sum
      val haN = ma.values.map(m => m * nano(math.log(n.toDouble / m))).sum
      val hbN = mb.values.map(m => m * nano(math.log(n.toDouble / m))).sum
      val base = r.getLong(0) == n &&
        math.abs(r.getDouble(1) - haN.toDouble / n / 1e9) <= 1e-6 &&
        math.abs(r.getDouble(2) - hbN.toDouble / n / 1e9) <= 1e-6 &&
        math.abs(r.getDouble(3) - miN.toDouble / n / 1e9) <= 1e-6
      if (haN <= 0 || hbN <= 0) base && r.isNullAt(4)
      else base && math.abs(r.getDouble(4) -
        miN.toDouble / math.sqrt(haN.toDouble * hbN.toDouble)) <= 1e-6
    }, n = 20)
  }

  test("nmiFromPartitions: identical non-trivial partitions give nmi = 1") {
    val df = Seq((1, 10), (1, 10), (2, 20), (3, 30), (3, 30)).toDF("pa", "pb")
    val r = graft.operators.EvalOps.nmiFromPartitions(df, "pa", "pb").head()
    graft.operators.DedupOps.releaseShingleCaches()
    assert(r.getDouble(4) == 1.0)
  }

  test("fleissKappa == brute-force multi-rater replay") {
    val row = for {
      a <- Gen.chooseNum(1, 3)
      b <- Gen.chooseNum(1, 3)
      c <- Gen.chooseNum(1, 3)
    } yield (a, b, c)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Int, Int, Int)] =>
      val df = rows.toDF("r1", "r2", "r3")
      val res = graft.operators.EvalOps
        .fleissKappa(df, Seq("r1", "r2", "r3"), 3).head()
      val n = rows.size.toLong
      val cnts = rows.map { case (a, b, c) =>
        (1 to 3).map(j => Seq(a, b, c).count(_ == j).toLong) }
      val aSum = cnts.map(_.map(x => x * x).sum).sum
      val ms = (0 until 3).map(j => cnts.map(_(j)).sum)
      val e = ms.map(m => BigInt(m) * m).sum
      val anr = BigInt(aSum) - BigInt(n) * 3
      val d1 = BigInt(n) * 6
      val d2 = BigInt(n) * n * 9
      val okP = math.abs(res.getDouble(2) - (BigDecimal(anr) / BigDecimal(d1)).toDouble) <= 1e-6 &&
        math.abs(res.getDouble(3) - (BigDecimal(e) / BigDecimal(d2)).toDouble) <= 1e-6
      val okK =
        if (d2 <= e) res.isNullAt(4)
        else math.abs(res.getDouble(4) -
          (BigDecimal(anr * d2 - e * d1) / BigDecimal(d1 * (d2 - e))).toDouble) <= 1e-6
      res.getLong(0) == n && res.getLong(1) == 3L && okP && okK
    }, n = 20)
  }

  test("fleissKappa: unanimous non-degenerate raters give kappa = 1") {
    val df = Seq((1, 1, 1), (2, 2, 2), (3, 3, 3), (1, 1, 1)).toDF("r1", "r2", "r3")
    val r = graft.operators.EvalOps.fleissKappa(df, Seq("r1", "r2", "r3"), 3).head()
    assert(r.getDouble(4) == 1.0)
  }

  test("cohenKappa == brute-force contingency kappa (plain + linear-weighted)") {
    val row = for {
      a <- Gen.chooseNum(1, 3)
      b <- Gen.chooseNum(1, 3)
    } yield (a, b)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(Int, Int)] =>
      val df = rows.toDF("ra", "rb")
      val r = graft.operators.EvalOps.cohenKappa(df, "ra", "rb", 3).head()
      val n = rows.size.toLong
      val diag = rows.count { case (a, b) => a == b }.toLong
      val wsum = rows.map { case (a, b) => 2L - math.abs(a - b) }.sum
      val ma = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val mb = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      val peNum = (1 to 3).map(j => ma.getOrElse(j, 0L) * mb.getOrElse(j, 0L)).sum
      val pewNum = (for (i <- 1 to 3; j <- 1 to 3)
        yield (2L - math.abs(i - j)) * ma.getOrElse(i, 0L) * mb.getOrElse(j, 0L)).sum
      val n2 = n * n
      val okPo = math.abs(r.getDouble(1) - diag.toDouble / n) <= 1e-6
      val okPe = math.abs(r.getDouble(2) - peNum.toDouble / n2) <= 1e-6
      val okK =
        if (n2 <= peNum) r.isNullAt(3)
        else math.abs(r.getDouble(3) - (diag * n - peNum).toDouble / (n2 - peNum)) <= 1e-6
      val okKw =
        if (2 * n2 <= pewNum) r.isNullAt(6)
        else math.abs(r.getDouble(6) - (wsum * n - pewNum).toDouble / (2 * n2 - pewNum)) <= 1e-6
      r.getLong(0) == n && okPo && okPe && okK && okKw
    }, n = 20)
  }

  test("cohenKappa: identical non-degenerate raters give kappa = kappa_w = 1") {
    val df = Seq((1, 1), (2, 2), (3, 3), (1, 1)).toDF("ra", "rb")
    val r = graft.operators.EvalOps.cohenKappa(df, "ra", "rb", 3).head()
    assert(r.getDouble(3) == 1.0 && r.getDouble(6) == 1.0)
  }

  test("chi2Independence == brute-force densified contingency chi-square") {
    val row = for {
      a <- Gen.oneOf("p", "q", "r")
      b <- Gen.oneOf("u", "v")
    } yield (a, b)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(String, String)] =>
      val df = rows.toDF("x", "y")
      val res = graft.operators.EvalOps.chi2Independence(df, "x", "y").collect()
      val n = rows.size.toLong
      val cnt = rows.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      val as = rows.map(_._1).distinct.sorted
      val bs = rows.map(_._2).distinct.sorted
      val ma = rows.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
      val mb = rows.groupBy(_._2).map { case (k, g) => k -> g.size.toLong }
      val want = for (a <- as; b <- bs) yield {
        val nab = cnt.getOrElse((a, b), 0L)
        val exp = ma(a).toDouble * mb(b).toDouble / n
        (a, b, nab, exp, (nab - exp) * (nab - exp) / exp)
      }
      res.length == want.length && res.zip(want).forall { case (r, (a, b, nab, exp, c2)) =>
        r.getString(0) == a && r.getString(1) == b && r.getLong(2) == nab &&
          math.abs(r.getDouble(3) - exp) <= 1e-6 && math.abs(r.getDouble(4) - c2) <= 1e-6
      }
    }, n = 20)
  }

  test("chi2Independence: a perfectly balanced grid has zero statistic") {
    val df = (for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val total = graft.operators.EvalOps.chi2Independence(df, "a", "b")
      .agg(sum(col("chi2_contrib"))).head().getDouble(0)
    assert(total == 0.0)
  }

  test("categoricalMi == brute-force contingency MI; total MI non-negative") {
    val row = for {
      a <- Gen.oneOf("x", "y", "z")
      b <- Gen.oneOf("p", "q", "r", "s")
    } yield (a, b)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(String, String)] =>
      val df = rows.toDF("a", "b")
      val got = graft.operators.EvalOps.categoricalMi(df, "a", "b").collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val n = rows.size.toDouble
      val byCell = rows.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val byA = rows.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val byB = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      val cellsOk = byCell.forall { case (cell @ (a, b), nab) =>
        val (gn, gc) = got(cell)
        gn == nab.toLong &&
        math.abs(gc - (nab / n) * math.log(nab * n / (byA(a) * byB(b)))) <= 1e-6
      }
      // MI ≥ 0 up to per-cell rounding
      cellsOk && got.keySet == byCell.keySet &&
      got.values.map(_._2).sum >= -1e-5 * got.size
    }, n = 25)
  }

  test("binnedGini == exact Gini of the bin-representative multiset") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-50L, 100000L))
      .suchThat(_.exists(_ >= 0L))
    check(Prop.forAllNoShrink(gen) { cs: List[Long] =>
      val df = cs.toDF("c")
      val r = graft.operators.EvalOps.binnedGini(df, col("c"), Bins).head()
      val kept = cs.filter(_ >= 0L)
      val mn = kept.min; val mx = kept.max
      val rep = kept.groupBy(c => (c - mn) * Bins / (mx - mn + 1))
        .map { case (b, vs) => b -> vs.min }
      val xs = kept.map(c => rep((c - mn) * Bins / (mx - mn + 1))).sorted
      val n = xs.size; val t = xs.sum
      val numOk = r.getLong(0) == n && r.getLong(1) == t
      if (t == 0L) numOk && r.isNullAt(2)
      else {
        val brute = xs.zipWithIndex
          .map { case (x, i) => (2.0 * (i + 1) - n - 1) * x }.sum / (n.toDouble * t)
        numOk && math.abs(r.getDouble(2) - brute) <= 1e-6
      }
    }, n = 25)
  }

  test("binnedGini: perfect equality gives 0, single-owner corpus near 1") {
    val eq = Seq(5L, 5L, 5L, 5L).toDF("c")
    assert(graft.operators.EvalOps.binnedGini(eq, col("c")).head().getDouble(2) == 0.0)
    val one = (Seq.fill(99)(0L) :+ 1000000L).toDF("c")
    val g = graft.operators.EvalOps.binnedGini(one, col("c")).head().getDouble(2)
    assert(g > 0.98, s"one owner of everything must be near-1 Gini, got $g")
  }

  test("benfordAudit == string first digit + chi-square vs log10(1 + 1/d)") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-100L, 2000000L))
      .suchThat(_.exists(_ > 0L))
    check(Prop.forAllNoShrink(gen) { cs: List[Long] =>
      val df = cs.toDF("c")
      val got = EvalOps.benfordAudit(df, col("c")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      val kept = cs.filter(_ > 0L)
      val byDigit = kept.groupBy(c => c.toString.head.asDigit.toLong)
      val nt = kept.size.toDouble
      byDigit.forall { case (d, rs) =>
        val expN = nt * math.log10(1.0 + 1.0 / d)
        val chi = (rs.size - expN) * (rs.size - expN) / expN
        val (gn, ge, gc) = got(d)
        gn == rs.size && math.abs(ge - expN) <= 1e-6 && math.abs(gc - chi) <= 1e-6
      } && got.keySet == byDigit.keySet
    }, n = 25)
  }
}
