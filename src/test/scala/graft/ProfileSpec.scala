package graft

import org.apache.spark.sql.functions._

import graft.operators.{LayoutOps, ProfileOps, TrainsetOps}

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profileColumns: counts, nulls, distincts, range, cents sum") {
    val df = Seq(
      (Some(1.5), Some(10.0)),
      (Some(2.5), None),
      (Some(1.5), Some(-3.25)),
      (None, Some(10.0))).toDF("a", "b")
    val rows = ProfileOps.profileColumns(df, Seq("a", "b")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = rows(0)
    assert(a.getLong(1) == 4 && a.getLong(2) == 3 && a.getLong(3) == 2)
    assert(a.getDouble(4) == 1.5 && a.getDouble(5) == 2.5)
    assert(a.getLong(6) == 550) // 150 + 250 + 150
    val b = rows(1)
    assert(b.getLong(2) == 3 && b.getLong(3) == 2)
    assert(b.getDouble(4) == -3.25 && b.getDouble(5) == 10.0)
    assert(b.getLong(6) == 10 * 100 * 2 - 325)
  }

  test("groupQuantiles: golden interpolation incl. exact-rank landing") {
    // group g: cents 100..500 (5 rows): p50 pos=2.0 → exactly 300;
    // p25 pos=1.0 → 200; p75 pos=3.0 → 400; p90 pos=3.6 → 400+0.6*100=460
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("k", "v")
    val q = ProfileOps.groupQuantiles(df, "k", "v")
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(q == Map(25 -> 2.0, 50 -> 3.0, 75 -> 4.0, 90 -> 4.6))
  }

  test("groupQuantiles: matches sort-based reference on multiple groups") {
    val rows = (1 to 377).map(i => (s"g${i % 3}", (i * 37 % 101).toDouble))
    val df = rows.toDF("k", "v")
    val got = ProfileOps.groupQuantiles(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val byGroup = rows.groupBy(_._1).view.mapValues(_.map(v => (v._2 * 100).toLong).sorted)
    for (((g, p), q) <- got) {
      val vs = byGroup(g)
      val pos = p.toDouble * (vs.length - 1) / 100.0
      val k = pos.toInt
      val lo = vs(k).toDouble
      val hi = if (k + 1 < vs.length) vs(k + 1).toDouble else lo
      val want = BigDecimal((lo + (hi - lo) * (pos - k)) / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(q == want, s"group $g p$p")
    }
  }
}

class SkylineSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("skyline2d golden: strict domination, same-x domination, duplicates kept") {
    val pts = Seq((1L, 5L, "a"), (2L, 3L, "b"), (2L, 4L, "c"), (3L, 3L, "d"),
      (4L, 1L, "e"), (5L, 5L, "f"), (4L, 1L, "e2"))
      .toDF("x", "y", "tag")
    val got = ProfileOps.skyline2d(pts).collect().map(_.getString(2)).toSet
    // (2,4) dominated by (2,3) same-x; (3,3) by (2,3) cross-x; (5,5) by (4,1);
    // the (4,1) duplicate survives (neither dominates the other)
    assert(got == Set("a", "b", "e", "e2"))
  }

  test("equiDepthHistogram: uniform cells split evenly; a heavy cell stays whole") {
    // 100 cells × 2 rows → 10 buckets of 20 rows each
    val uniform = (0 until 200).map(i => (i % 100).toLong).toDF("cell")
    val u = ProfileOps.equiDepthHistogram(uniform).collect()
    assert(u.length == 10 && u.forall(_.getLong(1) == 20L))
    assert(u.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      (0 until 10).map(b => (b * 10L, b * 10L + 9L)))
    graft.operators.DedupOps.releaseShingleCaches()
    // one cell holding half the mass lands in ONE bucket (type-1: no split)
    val skewed = (Seq.fill(100)(50L) ++ (0 until 100).map(_.toLong)).toDF("cell")
    val s = ProfileOps.equiDepthHistogram(skewed).collect()
    assert(s.map(_.getLong(1)).sum == 200L)
    val heavy = s.filter(r => r.getLong(2) <= 50 && r.getLong(3) >= 50)
    assert(heavy.length == 1 && heavy.head.getLong(1) >= 101L)
    graft.operators.DedupOps.releaseShingleCaches()
  }
}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: golden Morton interleaves") {
    val df = Seq(
      (0xFFFFL, 0L), // all x bits → even positions
      (0L, 0xFFFFL), // all y bits → odd positions
      (3L, 1L), //       x bits 0,1 → z bits 0,2 (5); y bit 0 → z bit 1 (2)
      (0L, 0L),
      (0x10000L, 0L) // 17th bit masked off
    ).toDF("x", "y")
    val z = df.select(LayoutOps.zValue(col("x"), col("y"))).as[Long].collect()
    assert(z.toSeq == Seq(0x55555555L, 0xAAAAAAAAL, 7L, 0L, 0L))
  }

  test("z-sorted layout gives tighter two-dimensional file ranges than x-sort") {
    // uniform 2-D grid of keys; cut each layout into equal "files" and sum
    // (x range + y range) per file — the pruning-relevant width
    val pts = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
    def totalWidth(sorted: Seq[(Long, Long)], files: Int): Long =
      sorted.grouped(sorted.size / files).map { chunk =>
        val xs = chunk.map(_._1); val ys = chunk.map(_._2)
        (xs.max - xs.min) + (ys.max - ys.min)
      }.sum
    val zsorted = df
      .withColumn("z", LayoutOps.zValue(col("x"), col("y")))
      .orderBy("z").select("x", "y").as[(Long, Long)].collect().toSeq
    val xsorted = pts.sortBy(p => (p._1, p._2))
    val zw = totalWidth(zsorted, 16)
    val xw = totalWidth(xsorted, 16)
    // x-sort leaves every file's y range at full width (63); Z-order
    // bounds both dimensions per file
    assert(zw < xw / 2, s"z width $zw vs x width $xw")
  }

  test("zCells covers all rows and cell key ranges nest inside 32x32 boxes") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val cells = LayoutOps.zCells(li, "l_partkey", "l_suppkey", k = 1000).collect()
    assert(cells.map(_.getLong(1)).sum == li.count())
    for (c <- cells) {
      // shift 10 drops 5 x-bits + 5 y-bits: every cell is exactly one
      // 32×32 key box, and at sf0.001 keys are < 65536 so spans are direct
      assert(c.getLong(3) - c.getLong(2) < 32, s"x span in $c")
      assert(c.getLong(5) - c.getLong(4) < 32, s"y span in $c")
    }
  }
}

class DeltaSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val newSnap = Seq((2L, "b"), (3L, "C"), (4L, "d"), (5L, "e")).toDF("k", "v")
    val out = graft.operators.DeltaOps
      .snapshotDiff(oldSnap, newSnap, "k", Seq(col("v")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      "added" -> (1L, 5L), //     key 5 arrived
      "removed" -> (1L, 1L), //   key 1 dropped
      "changed" -> (1L, 3L), //   key 3's digest moved
      "unchanged" -> (2L, 6L))) // keys 2 + 4
  }

  test("scd2Apply edge: empty change batch carries everything; empty dim inserts everything") {
    val dim = Seq((1L, "A", 10L), (2L, "B", 10L)).toDF("k", "attr", "valid_from")
    val noChanges = Seq.empty[(Long, String, Long)].toDF("k", "attr", "ts")
    val carried = graft.operators.DeltaOps.scd2Apply(dim, noChanges).collect()
    assert(carried.length == 2 && carried.forall(r =>
      r.getString(5) == "carried" && r.getBoolean(4)))
    val emptyDim = Seq.empty[(Long, String, Long)].toDF("k", "attr", "valid_from")
    val changes = Seq((7L, "Z", 20L)).toDF("k", "attr", "ts")
    val inserted = graft.operators.DeltaOps.scd2Apply(emptyDim, changes).collect()
    assert(inserted.length == 1 && inserted(0).getString(5) == "inserted" &&
      inserted(0).getLong(2) == 20L)
  }

  test("scd2Apply golden: carried, no-op change, closed+inserted, new key") {
    val dim = Seq((1L, "A", 10L), (2L, "B", 10L), (3L, "C", 10L))
      .toDF("k", "attr", "valid_from")
    val changes = Seq((2L, "B", 20L), (3L, "X", 20L), (4L, "Y", 20L))
      .toDF("k", "attr", "ts")
    val out = graft.operators.DeltaOps.scd2Apply(dim, changes).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4), r.getString(5)))
      .sortBy(t => (t._1, t._3))
    assert(out.toSeq == Seq(
      (1L, "A", 10L, -1L, true, "carried"),  // untouched key
      (2L, "B", 10L, -1L, true, "carried"),  // change with same attr: no-op
      (3L, "C", 10L, 20L, false, "closed"),  // changed: old generation closes
      (3L, "X", 20L, -1L, true, "inserted"), //   ... and the new one opens
      (4L, "Y", 20L, -1L, true, "inserted"))) // unseen key inserts
    // invariant: exactly one current row per key
    val cur = out.filter(_._5).groupBy(_._1).view.mapValues(_.size)
    assert(cur.values.forall(_ == 1))
  }
}

class TrainsetSpec extends SparkSpec {
  import spark.implicits._

  test("rebalanceClasses: every label lands exactly on the majority count") {
    val df = ((1 to 7).map(i => (i.toLong, 0)) ++ (8 to 10).map(i => (i.toLong, 1)) ++
      Seq((11L, 2))).toDF("vec_id", "label")
    val out = TrainsetOps.rebalanceClasses(df).collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0, 7L, 7L), (1, 3L, 7L), (2, 1L, 7L)))
    // label 2: the single row replicates 7× → checksum 7*11
    assert(out(2).getLong(3) == 77L)
    // label 1: ranks 0,1,2 of (8,9,10), target 7 → floor-diff reps 2,2,3
    assert(out(1).getLong(3) == 8 * 2 + 9 * 2 + 10 * 3)
  }

  test("rebalanceClasses on real embeddings: all labels equal, ids conserved") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val out = TrainsetOps.rebalanceClasses(emb).collect()
    val t = out.map(_.getLong(1)).max
    assert(out.forall(_.getLong(2) == t))
  }

  test("quantizeEmbeddings: codes bounded, reconstruction error within half a step") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val out = TrainsetOps.quantizeEmbeddings(emb).collect()
    assert(out.length == 64)
    for (r <- out) {
      val (minV, maxV, err) = (r.getDouble(1), r.getDouble(2), r.getDouble(5))
      // midpoint decode: |err| <= step/2 = (max-min)/510 per value
      assert(err <= (maxV - minV) / 510.0 + 1e-9, s"dim ${r.getInt(0)} err $err")
      assert(r.getLong(4) <= r.getLong(3), "saturated count bounded by n")
    }
  }

  test("contrastiveTriplets: one per vector, pos same label, neg next label") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sortedLabels = labels.values.toSeq.distinct.sorted
    val nextLabel = sortedLabels.zip(sortedLabels.tail :+ sortedLabels.head).toMap
    val out = TrainsetOps.contrastiveTriplets(emb).collect()
    assert(out.length == labels.size)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    for (r <- out) {
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(labels(p) == labels(a), "positive label")
      assert(labels(n) == nextLabel(labels(a)), "negative label")
      assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("weightedSample: matches a local Efraimidis–Spirakis reference") {
    import org.apache.spark.sql.functions.col
    val docs = (1 to 200)
      .map(i => (i.toLong, s"src${i % 3}", 10L + (i * 37) % 900))
      .toDF("doc_id", "source", "n_chars")
    val got = TrainsetOps.weightedSample(docs, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val want = (1 to 200).map { i =>
      val h = graft.functions.PortableHash.hash60Local(s"wsample:$i")
      val lnU = math.log((h + 1).toDouble / 1152921504606846976L.toDouble)
      val w = 10L + (i * 37) % 900
      (i.toLong, math.round(lnU / w.toDouble * 1e9))
    }.sortBy { case (id, key) => (-key, id) }.take(10)
    assert(got.toSeq == want.toSeq)
    // larger weight ⇒ key closer to 0: same hash, bigger n_chars wins
    val lnU = math.log(0.5)
    assert(math.round(lnU / 100.0 * 1e9) > math.round(lnU / 10.0 * 1e9))
  }
}
class ProfileEdgeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("groupQuantiles: empty input and single-row groups are defined") {
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    assert(ProfileOps.groupQuantiles(empty, "k", "v").collect().isEmpty)
    val single = Seq(("a", 7.0), ("b", -2.0)).toDF("k", "v")
    val qs = ProfileOps.groupQuantiles(single, "k", "v").collect()
    // n = 1: every percentile is the value itself
    assert(qs.length == 8)
    qs.foreach { r =>
      val want = if (r.getString(0) == "a") 7.0 else -2.0
      assert(r.getDouble(3) == want)
    }
  }

  test("winsorizedStats: NaN/null rows are dropped before ranking") {
    val df = Seq(
      Some(1.0), Some(2.0), Some(3.0), None, Some(Double.NaN)
    ).map(v => ("g", v)).toDF("k", "v")
      .select(col("k"), col("v").cast("double").as("v"))
    val out = ProfileOps.winsorizedStats(df, "k", "v").collect()
    assert(out.length == 1 && out.head.getLong(1) == 3)
  }

  test("profileColumns: an all-null column keeps its row with zero stats") {
    val df = Seq((Option.empty[Double], 1.0), (None, 2.0)).toDF("a", "b")
    val rows = ProfileOps.profileColumns(df, Seq("a", "b")).collect()
    val a = rows.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 2 && a.getLong(2) == 0 && a.getLong(3) == 0)
    assert(a.isNullAt(4) && a.isNullAt(5) && a.isNullAt(6))
  }

  test("zCells: empty input yields an empty cell relation") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(LayoutOps.zCells(empty, "x", "y").collect().isEmpty)
  }

  test("snapshotDiff: identical snapshots are all unchanged; disjoint all add/remove") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val same = graft.operators.DeltaOps.snapshotDiff(a, a, "k", Seq(col("v"))).collect()
    assert(same.map(r => r.getString(0) -> r.getLong(1)).toSeq == Seq("unchanged" -> 2L))
    val b = Seq((3L, "z")).toDF("k", "v")
    val disj = graft.operators.DeltaOps.snapshotDiff(a, b, "k", Seq(col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(disj == Map("added" -> 1L, "removed" -> 2L))
  }

  test("weightedMedianBy == brute-force smallest value with cum weight >= ceil(W/2)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def check(p: Prop, n: Int): Unit = {
      val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
      assert(res.passed, res.status.toString)
    }
    val row = for {
      g <- Gen.oneOf("s1", "s2", "s3")
      v <- Gen.chooseNum(-100L, 100L)
      w <- Gen.chooseNum(1L, 50L)
    } yield (g, v, w)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(String, Long, Long)] =>
      val df = rows.toDF("g", "v", "w")
      val got = ProfileOps.weightedMedianBy(df, "g", col("v"), col("w"), nBins = 16)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      graft.operators.DedupOps.releaseShingleCaches()
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val tw = rs.map(_._3).sum
        val target = (tw + 1) / 2
        val byV = rs.groupBy(_._2).map { case (v, g2) => v -> g2.map(_._3).sum }
          .toSeq.sortBy(_._1)
        var cum = 0L
        val med = byV.collectFirst {
          case (v, wv) if { cum += wv; cum >= target } => v
        }.get
        g -> ((tw, med))
      }
      got == want
    }, n = 20)
  }

  test("weightedQuantilesBy == brute-force ladder at every p") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def check(p: Prop, n: Int): Unit = {
      val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
      assert(res.passed, res.status.toString)
    }
    val ps = Seq(25, 50, 75, 90)
    val row = for {
      g <- Gen.oneOf("s1", "s2")
      v <- Gen.chooseNum(-50L, 50L)
      w <- Gen.chooseNum(1L, 20L)
    } yield (g, v, w)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows: List[(String, Long, Long)] =>
      val df = rows.toDF("g", "v", "w")
      val got = ProfileOps.weightedQuantilesBy(df, "g", col("v"), col("w"), ps, nBins = 16)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), ps.indices.map(i => r.getLong(2 + i))))
        .toMap
      graft.operators.DedupOps.releaseShingleCaches()
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val tw = rs.map(_._3).sum
        val byV = rs.groupBy(_._2).map { case (v, g2) => v -> g2.map(_._3).sum }
          .toSeq.sortBy(_._1)
        val qs = ps.map { p =>
          val target = (p * tw + 99) / 100
          var cum = 0L
          byV.collectFirst { case (v, wv) if { cum += wv; cum >= target } => v }.get
        }
        g -> ((tw, qs: Seq[Long]))
      }
      got == want
    }, n = 20)
  }

  test("weightedMedianBy with unit weights == the plain lower median") {
    val df = (1L to 9L).map(v => ("s", v, 1L)).toDF("g", "v", "w")
    val r = ProfileOps.weightedMedianBy(df, "g", col("v"), col("w")).head()
    graft.operators.DedupOps.releaseShingleCaches()
    assert(r.getLong(1) == 9L && r.getLong(2) == 5L)
  }
}
