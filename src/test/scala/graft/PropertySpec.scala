package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.core.{BinMethod, BinSpec}
import graft.operators.HistogramOps

/** ScalaCheck properties (SURVEY §5.2.3) — run through scalacheck's own
  * runner inside ScalaTest (the scalatestplus bridge isn't on the offline
  * classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("BinSpec: derive is total and bins == hi - lo on sane ranges") {
    check(Prop.forAll(Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(0.0, 1000.0)) {
      (mn: Double, span: Double) =>
        val mx = mn + span
        val lin = BinSpec.derive(mn, mx, BinMethod.Linear)
        val log = BinSpec.derive(mn, mx, BinMethod.Log)
        lin.bins == lin.hi - lin.lo && lin.bins >= 20 &&
        log.bins == log.hi - log.lo && log.offset >= 0.0 &&
        (mn > 0 || log.offset == math.abs(mn) + 1)
    }, n = 100)
  }

  test("histogram mass conservation: sum(counts) == #in-range codes") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-50, 150))
    check(Prop.forAll(gen) { xs: List[Int] =>
      val df = xs.toDF("code")
      val total = HistogramOps.binCounts(df, 0, 100).agg(sum("count")).head().getLong(0)
      total == xs.count(x => x >= 0 && x <= 100)
    }, n = 15)
  }

  test("merge is commutative and preserves mass") {
    val gen = Gen.listOfN(10, Gen.chooseNum(0L, 20L))
    check(Prop.forAll(gen, gen) { (h1: List[Long], h2: List[Long]) =>
      def df(h: List[Long]) =
        h.zipWithIndex.map { case (c, b) => (b, c) }.toDF("bin", "count")
      val ab = HistogramOps.merge(df(h1), df(h2)).orderBy("bin").collect().map(_.getLong(1)).toSeq
      val ba = HistogramOps.merge(df(h2), df(h1)).orderBy("bin").collect().map(_.getLong(1)).toSeq
      ab == ba && ab.sum == h1.sum + h2.sum
    }, n = 10)
  }

  test("quantize is order-preserving over positive values (linear)") {
    val spec = BinSpec(0, 100000, 0.0, BinMethod.Linear)
    val gen = Gen.listOfN(20, Gen.chooseNum(0.0, 900.0))
    check(Prop.forAll(gen) { xs: List[Double] =>
      val sorted = xs.sorted
      val codes = sorted
        .toDF("value")
        .select(HistogramOps.quantize(col("value"), spec).as("c"))
        .collect()
        .map(_.getInt(0))
        .toSeq
      codes == codes.sorted
    }, n = 10)
  }

  test("deciles: percentiles ∈ {0..100}, counts sum to total") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(1L, 50L))
    check(Prop.forAll(gen) { counts: List[Long] =>
      val histo = counts.zipWithIndex
        .map { case (c, i) => (i.toDouble, c) }
        .toDF("value", "cnt")
      val out = graft.operators.PercentileOps.deciles(histo).collect()
      val percentiles = out.map(_.getLong(0))
      percentiles.forall(p => p >= 0 && p <= 100 && p % 10 == 0) &&
      out.map(_.getLong(3)).sum == counts.sum
    }, n = 10)
  }
  test("zValue is a bijection on 16-bit key pairs (local interleave model)") {
    // model the interleave in plain Scala and check injectivity + inverse
    def spread(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    val pairGen = Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L))
    check(Prop.forAll(pairGen, pairGen) { (a, b) =>
      val za = spread(a._1) | (spread(a._2) << 1)
      val zb = spread(b._1) | (spread(b._2) << 1)
      (a == b) == (za == zb)
    })
    // the Spark expression agrees with the model on a sample
    val sample = (0 until 200).map(i => ((i * 131L) % 65536, (i * 771L) % 65536))
    val got = sample
      .toDF("x", "y")
      .select(graft.operators.LayoutOps.zValue(col("x"), col("y")))
      .as[Long]
      .collect()
    val want = sample.map { case (x, y) => spread(x) | (spread(y) << 1) }
    assert(got.toSeq == want)
  }

  test("groupQuantiles: q is monotone in p and bounded by the group's range") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-500.0, 500.0))
    check(Prop.forAll(gen) { xs: List[Double] =>
      val df = xs.map(v => ("g", v)).toDF("k", "v")
      val qs = graft.operators.ProfileOps
        .groupQuantiles(df, "k", "v")
        .collect()
        .map(r => r.getInt(1) -> r.getDouble(3))
        .sortBy(_._1)
      val cents = xs.map(v => (v * 100).toLong)
      val lo = cents.min / 100.0
      val hi = cents.max / 100.0
      qs.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)) &&
      qs.forall { case (_, q) => q >= lo - 1e-9 && q <= hi + 1e-9 }
    }, n = 15)
  }

  test("skyline2d: kept points undominated, dropped points dominated (random point sets)") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L)))
    check(Prop.forAll(gen) { pts0 =>
      val pts = pts0.zipWithIndex.map { case ((x, y), i) => (x, y, i.toLong) }
      val kept = graft.operators.ProfileOps
        .skyline2d(pts.toDF("x", "y", "id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def dominates(p: (Long, Long), q: (Long, Long)) =
        p._1 <= q._1 && p._2 <= q._2 && (p._1 < q._1 || p._2 < q._2)
      val all = pts.map(t => (t._1, t._2))
      pts.forall { case t @ (x, y, _) =>
        val dominated = all.exists(p => dominates(p, (x, y)))
        if (kept.contains(t)) !dominated else dominated
      }
    }, n = 15)
  }

  test("rebalanceClasses: every label lands on the max count for random multisets") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0, 4)).map(_.take(60))
    check(Prop.forAll(gen) { labels: List[Int] =>
      val df = labels.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("vec_id", "label")
      val out = graft.operators.TrainsetOps.rebalanceClasses(df).collect()
      val t = out.map(_.getLong(1)).max
      out.forall(_.getLong(2) == t)
    }, n = 15)
  }

  test("profileColumns: two-level distinct aggregate matches brute force incl. null/NaN") {
    // guards the round-7 manual rewrite (groupBy(col,v)+fold replaced the
    // Expand-planning countDistinct mix): n_rows counts everything,
    // NaN counts as missing, cents sum truncates per VALUE times its
    // multiplicity, distinct skips nulls
    val cell: Gen[Option[Double]] = Gen.frequency(
      6 -> Gen.chooseNum(-500.0, 500.0).map(Some(_)),
      1 -> Gen.const(Some(Double.NaN)),
      1 -> Gen.const(Option.empty[Double]),
      2 -> Gen.chooseNum(-5, 5).map(i => Some(i.toDouble))) // forced collisions
    val gen = Gen.nonEmptyListOf(Gen.zip(cell, cell))
    check(Prop.forAll(gen) { rows: List[(Option[Double], Option[Double])] =>
      val df = rows.toDF("a", "b")
      val out = graft.operators.ProfileOps
        .profileColumns(df, Seq("a", "b"))
        .collect()
        .map(r => r.getString(0) -> r)
        .toMap
      Seq("a" -> rows.map(_._1), "b" -> rows.map(_._2)).forall { case (name, vs) =>
        val clean = vs.flatten.filterNot(_.isNaN) // NaN => missing (nanAsNull)
        val r = out(name)
        val centsOk =
          if (clean.isEmpty) r.isNullAt(6)
          else r.getLong(6) == clean.map(v => (v * 100.0).toLong).sum
        r.getLong(1) == vs.size &&
        r.getLong(2) == clean.size &&
        r.getLong(3) == clean.distinct.size &&
        (clean.nonEmpty || (r.isNullAt(4) && r.isNullAt(5))) &&
        (clean.isEmpty || (r.getDouble(4) == clean.min && r.getDouble(5) == clean.max)) &&
        centsOk
      }
    }, n = 25)
  }

  test("pmiBigrams matches brute force (values, ordering, minCount) on random corpora") {
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val doc = Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val gen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(gen) { docs: List[String] =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.operators.TextOps
        .pmiBigrams(df, minCount = 2L, topK = 10)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toList
      val toks = docs.map(_.split(" ").toList)
      val pairCnt = toks.flatMap(ts => ts.zip(ts.tail)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val uniCnt = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tp = pairCnt.values.sum.toDouble
      val t = uniCnt.values.sum.toDouble
      val want = pairCnt.toList
        .filter(_._2 >= 2L)
        .map { case ((w1, w2), cp) =>
          val v = math.log(cp / tp / (uniCnt(w1) / t) / (uniCnt(w2) / t))
          (w1, w2, cp, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }
        .take(10)
      got == want
    }, n = 12)
  }

  test("trainingOrder head equals the global md5-order head for random id sets") {
    val md = () => java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md().digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val gen = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 5000L))).map(_.distinct)
    check(Prop.forAll(gen) { ids: List[Long] =>
      val df = ids.map(id => (id, s"t$id")).toDF("doc_id", "text")
      val got = graft.operators.TrainsetOps
        .trainingOrder(df, sample = 20)
        .collect()
        .sortBy(_.getInt(2))
        .map(r => (r.getLong(0), r.getString(1)))
        .toList
      val want = ids
        .map(id => (id, md5hex(id.toString)))
        .sortBy { case (id, h) => (h, id) }
        .take(20)
      got == want
    }, n = 12)
  }

  test("zoneSkipping matches a brute-force replay on random day sequences") {
    val gen = for {
      n <- Gen.chooseNum(1, 120)
      days <- Gen.listOfN(n, Gen.chooseNum(50, 80))
      fileRows <- Gen.oneOf(3, 5, 16)
      lo <- Gen.chooseNum(50, 80)
      span <- Gen.chooseNum(0, 15)
    } yield (days, fileRows, lo, lo + span)
    check(Prop.forAll(gen) { case (days: List[Int], fileRows: Int, lo: Int, hi: Int) =>
      val rows = days.zipWithIndex.map { case (d, i) =>
        (i.toLong + 1, 1, new java.sql.Date(d * 86400000L))
      }
      val got = graft.operators.LayoutOps
        .zoneSkipping(rows.toDF("l_orderkey", "l_linenumber", "l_shipdate"), fileRows, lo, hi)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      def replay(sorted: List[Int]) = {
        val files = sorted.grouped(fileRows).toList
        val scanned = files.filter(f => f.max >= lo && f.min <= hi)
        val ratio = BigDecimal(1.0 - scanned.map(_.size).sum.toDouble / sorted.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (files.size.toLong, scanned.size.toLong, scanned.map(_.size).sum.toLong, ratio)
      }
      // natural = orderkey order = input order; sorted = by (day, orderkey)
      got("natural") == replay(days) &&
      got("shipdate") == replay(days.zipWithIndex.sortBy { case (d, i) => (d, i) }.map(_._1))
    }, n = 12)
  }

  test("joinSizeEstimate is one-sided and exact without collisions (random multisets)") {
    // ≤ 6 distinct keys over 4×1024 buckets: P(some pair collides in all
    // 4 depth rows) ~ (15/1024)^4 ≈ 5e-8 — the min over rows recovers the
    // exact inner product
    val key = Gen.chooseNum(0, 5).map(i => s"k$i")
    val side = Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, key))
    check(Prop.forAll(side, side) { (xs: List[String], ys: List[String]) =>
      val r = graft.operators.SketchOps
        .joinSizeEstimate(xs.toDF("k"), col("k"), ys.toDF("k"), col("k"))
        .head()
      val ca = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = ys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exact = ca.map { case (k, c) => c * cb.getOrElse(k, 0L) }.sum
      r.getLong(0) == exact && r.getLong(1) == exact
    }, n = 12)
  }

  test("docKeywords matches a brute-force TF-IDF replay on random corpora") {
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val doc = Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val gen = Gen.chooseNum(2, 7).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(gen) { docs: List[String] =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.operators.TextOps.docKeywords(df, k = 2).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).toList
      val tf = docs.zipWithIndex.flatMap { case (t, i) =>
        t.split(" ").groupBy(identity).map { case (w, g) => (i.toLong, w, g.length.toLong) }
      }
      val dfreq = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nd = docs.size.toDouble
      val want = tf
        .map { case (d, w, c) =>
          (d, w, c * math.round(math.log(nd / dfreq(w)) * 1e9))
        }
        .groupBy(_._1).toList
        .flatMap { case (d, rows) =>
          rows.sortBy { case (_, w, nano) => (-nano, w) }.take(2).zipWithIndex.map {
            case ((_, w, nano), i) =>
              val v = BigDecimal(nano.toDouble / 1e9)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              (d, i + 1, w, v)
          }
        }
        .sortBy { case (d, rk, _, _) => (d, rk) }
      got == want
    }, n = 12)
  }

  test("labelNoise matches a brute-force kNN replay on random labeled points") {
    // zero vectors excluded: their cosine is null on both sides, and the
    // operator ranks null-cos rows last while a replay would drop them —
    // a modeling choice this property doesn't exercise
    val pt = Gen.zip(Gen.chooseNum(-5, 5), Gen.chooseNum(-5, 5), Gen.chooseNum(0, 2))
    val gen = Gen.chooseNum(4, 14)
      .flatMap(n => Gen.listOfN(n, pt))
      .map(_.distinct.filter(p => p._1 != 0 || p._2 != 0))
      .suchThat(_.size >= 2)
    check(Prop.forAll(gen) { pts: List[(Int, Int, Int)] =>
      val k = 3
      val rows = pts.zipWithIndex.map { case ((x, y, l), i) =>
        (i.toLong, Array(x.toFloat, y.toFloat), l)
      }
      val df = rows.toDF("vec_id", "embedding", "label")
      val got = graft.operators.SimilarityOps.labelNoise(df, k = k, probeEvery = 1)
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
      // replay: cosine rounded to 6dp (the operator's pre-rank rounding),
      // rank by (cos desc, id), agreement over the top-k
      def cos(a: Array[Float], b: Array[Float]): java.lang.Double = {
        val dot = a.zip(b).map { case (p, q) => p.toDouble * q }.sum
        val na = math.sqrt(a.map(p => p.toDouble * p).sum)
        val nb = math.sqrt(b.map(p => p.toDouble * p).sum)
        if (na == 0 || nb == 0) null
        else BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val perProbe = rows.map { case (qid, qv, ql) =>
        val neigh = rows
          .filter(_._1 != qid)
          .flatMap { case (cid, cv, cl) => Option(cos(qv, cv)).map(c => (cid, cl, c.toDouble)) }
          .sortBy { case (cid, _, c) => (-c, cid) }
          .take(k)
        (ql, neigh.count(_._2 == ql).toLong)
      }
      val want = perProbe.groupBy(_._1).map { case (l, g) =>
        val n = g.size.toLong
        val m = g.map(_._2).sum
        val mean = BigDecimal(m.toDouble / (n * k).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        l -> ((n, mean, g.count(_._2 * 2 < k).toLong))
      }
      got == want
    }, n = 10)
  }

  test("zipfSlope equals the explicit window-rank OLS twin on random corpora") {
    import org.apache.spark.sql.expressions.Window
    val word = Gen.oneOf((1 to 9).map(i => s"w$i"))
    val doc = Gen.chooseNum(3, 25).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val langDoc = Gen.zip(Gen.oneOf("en", "de"), doc)
    val gen = Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, langDoc))
    check(Prop.forAll(gen) { docs: List[(String, String)] =>
      val df = docs.zipWithIndex
        .map { case ((l, t), i) => (i.toLong, t, l) }
        .toDF("doc_id", "text", "lang")
      val got = graft.operators.TextOps
        .zipfSlope(df)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      val tc = df
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("c").desc, col("tok"))))
        .select("lang", "c", "rk").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      tc.groupBy(_._1).forall { case (lang, rows) =>
        val xs = rows.map { case (_, _, rk) => math.round(math.log(rk) * 1e9) }
        val ys = rows.map { case (_, c, _) => math.round(math.log(c) * 1e9) }
        val n = BigInt(xs.length)
        val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
        val sxx = xs.map(x => BigInt(x) * x).sum
        val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
        val dxx = (n * sxx - sx * sx).toDouble
        val (gn, gs) = got(lang)
        if (dxx == 0.0) gn == rows.length.toLong // degenerate: slope NaN both ways
        else {
          val slope = (n * sxy - sx * sy).toDouble / dxx
          gn == rows.length.toLong &&
          gs == BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    }, n = 8)
  }
}
