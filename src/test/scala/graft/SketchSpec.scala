package graft

import org.apache.spark.sql.functions.col

import graft.operators.SketchOps
import graft.sources.Tables

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(n: Int, dups: Int): (Long, Double, Double) = {
    val df = (0 until n * dups).map(i => s"user-${i % n}").toDF("k")
    val r = SketchOps.approxDistinct(df, col("k")).collect()(0)
    (r.getLong(0), r.getDouble(1), r.getDouble(2))
  }

  test("HLL-256 accuracy: within 3 standard errors across cardinalities") {
    // standard error ≈ 1.04/√256 = 6.5% — allow 3σ ≈ 20%
    for (n <- Seq(10, 100, 1000, 20000)) {
      val (exact, est, relErr) = estimate(n, 3)
      assert(exact == n.toLong)
      assert(relErr < 0.20, s"n=$n est=$est relErr=$relErr")
    }
  }

  test("estimate depends only on the distinct set (duplication-invariant)") {
    val once = estimate(500, 1)
    val many = estimate(500, 7)
    assert(once._2 == many._2, "registers are max-based: duplicates must not move the estimate")
  }

  test("empty-ish input hits the small-range correction branch") {
    val (exact, est, relErr) = estimate(3, 2)
    assert(exact == 3L)
    assert(relErr < 0.35, s"small-range estimate $est")
  }
  test("overlapEstimate: exact flags right, inclusion–exclusion consistent, merge = rebuild") {
    import org.apache.spark.sql.functions._
    // A = 0..599, B = 400..999 → |A|=600 |B|=600 |A∩B|=200 |A∪B|=1000
    val a = (0 until 600).map(i => s"u$i").toDF("user_id")
    val b = (400 until 1000).map(i => s"u$i").toDF("user_id")
    val r = SketchOps.overlapEstimate(a, b, col("user_id")).collect()(0)
    val (nA, nB, nBoth) = (r.getAs[Long]("n_exact_a"), r.getAs[Long]("n_exact_b"),
      r.getAs[Long]("n_exact_both"))
    assert((nA, nB, nBoth) == ((600L, 600L, 200L)))
    val (eA, eB, eU, eO) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"), r.getAs[Double]("est_overlap"))
    // the output IS the inclusion–exclusion of its own parts
    assert(math.abs(eO - (eA + eB - eU)) < 1e-6)
    // HLL 256 standard error ≈ 6.5%; union of 1000 within 3σ
    assert(math.abs(eU - 1000.0) / 1000.0 < 0.20, s"est_union=$eU")
    // the MERGED register estimate must equal rebuilding the sketch from
    // the concatenated input — the lossless-merge property
    val rebuilt = SketchOps
      .approxDistinct(a.union(b), col("user_id"))
      .collect()(0)
      .getDouble(1)
    assert(eU == rebuilt, s"merged=$eU rebuilt=$rebuilt")
  }

  test("cumulativeDistinct: both curves monotone, exact endpoint = total distinct, est within 3σ") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.col
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    // 900 events, 300 users, spread over 6 days; later days repeat old users
    val rows = (0 until 900).map { i =>
      (new Timestamp(base + (i % 6) * 86400000L), (i % 300).toLong)
    }
    val df = rows.toDF("ts", "user_id")
    val out = SketchOps.cumulativeDistinct(df, col("user_id")).collect()
    assert(out.length == 6)
    val exact = out.map(_.getAs[Long]("n_exact_cum"))
    val est = out.map(_.getAs[Double]("n_est_cum"))
    assert(exact.sameElements(exact.sorted), "exact curve monotone")
    assert(est.sameElements(est.sorted), "running register max ⇒ estimate monotone")
    assert(exact.last == 300L)
    assert(math.abs(est.last - 300.0) / 300.0 < 0.20, s"endpoint est ${est.last}")
    graft.operators.DedupOps.releaseShingleCaches()
  }

  test("bloomProbeSummary edge: empty filter flags nothing; fp_rate defined at 0") {
    import org.apache.spark.sql.functions.col
    val empty = Seq.empty[String].toDF("k")
    val probes = (0 until 50).map(i => s"p$i").toDF("k")
    val r = SketchOps.bloomProbeSummary(empty, probes).collect()(0)
    assert(r.getAs[Long]("n_set_bits") == 0L)
    assert(r.getAs[Long]("n_flagged") == 0L)
    assert(r.getAs[Long]("n_false_pos") == 0L)
    assert(r.getAs[Double]("fp_rate") == 0.0)
  }

  test("bloomProbeSummary: zero false negatives, exact truth counts, rates bounded") {
    import org.apache.spark.sql.functions._
    val filterSet = (0 until 300).map(i => s"k$i").toDF("k")
    val probeSet = (150 until 650).map(i => s"k$i").toDF("k") // 150 members
    val r = SketchOps.bloomProbeSummary(filterSet, probeSet).collect()(0)
    assert(r.getAs[Long]("n_filter_keys") == 300L)
    assert(r.getAs[Long]("n_probes") == 500L)
    assert(r.getAs[Long]("n_true_member") == 150L)
    // no false negatives: every true member is flagged
    assert(r.getAs[Long]("n_flagged") >= 150L)
    assert(r.getAs[Long]("n_false_pos") == r.getAs[Long]("n_flagged") - 150L)
    // 300 keys × 3 hashes in 4096 bits: set-bit count bounded by both
    assert(r.getAs[Long]("n_set_bits") <= 900L && r.getAs[Long]("n_set_bits") <= 4096L)
    val fp = r.getAs[Double]("fp_rate")
    assert(fp >= 0.0 && fp < 0.2, s"fp_rate=$fp") // theory ≈ 0.8% at this load
  }

  test("count-min: estimate never undercounts; tiny corpus estimates exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val words = Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++ Seq.fill(1)("gamma") ++
      (1 to 30).map(i => s"filler$i")
    val df = scala.util.Random.shuffle(words).toDF("tok")
    val out = graft.operators.SketchOps
      .cmsEstimate(df, col("tok"), Seq("alpha", "beta", "gamma", "absent"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // CMS one-sided error: n_cms >= n_exact always
    out.values.foreach { case (exact, cms, over) =>
      assert(cms >= exact && over == cms - exact)
    }
    // 78 tokens over 4x1024 buckets: collisions vanish, estimates exact
    assert(out("alpha") == ((40L, 40L, 0L)))
    assert(out("beta") == ((7L, 7L, 0L)))
    assert(out("gamma") == ((1L, 1L, 0L)))
    assert(out("absent")._1 == 0L)
  }

  test("overlapMatrix rows equal overlapEstimate run pair-by-pair") {
    val rows =
      (0 to 9).map(i => ("A", s"u$i")) ++
        (5 to 14).map(i => ("B", s"u$i")) ++
        (0 to 4).map(i => ("C", s"u$i")) ++
        (0 to 4).map(i => ("C", s"u$i")) // duplicates must not change anything
    val df = rows.toDF("cat", "k")
    val got = SketchOps.overlapMatrix(df, col("cat"), col("k")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(5), r.getDouble(6)))).toMap
    graft.operators.DedupOps.releaseShingleCaches()
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    got.keys.foreach { case (a, b) =>
      val pair = SketchOps.overlapEstimate(
        df.filter(col("cat") === a), df.filter(col("cat") === b), col("k")).head()
      graft.operators.DedupOps.releaseShingleCaches()
      assert(got((a, b)) == ((pair.getLong(2), pair.getDouble(5), pair.getDouble(6))),
        s"pair ($a,$b) disagrees with overlapEstimate")
    }
    assert(got(("A", "B"))._1 == 5L && got(("A", "C"))._1 == 5L && got(("B", "C"))._1 == 0L)
  }

  test("joinSizeEstimate: one-sided, exact on tiny key sets, self-join audit sane") {
    // A: key a ×5, b ×2; B: a ×3, c ×4 → |A ⋈ B| = 5·3 = 15; few keys over
    // 4×1024 buckets → collision-free in every depth row → estimate exact
    val a = (Seq.fill(5)("a") ++ Seq.fill(2)("b")).toDF("k")
    val b = (Seq.fill(3)("a") ++ Seq.fill(4)("c")).toDF("k")
    val r = SketchOps.joinSizeEstimate(a, col("k"), b, col("k")).head()
    assert(r.getLong(0) == 15L && r.getLong(1) == 15L && r.getDouble(2) == 0.0)
    // disjoint keys: exact 0, estimate may only over-count; rel_over is
    // NULL (guarded division — never NaN/Inf into the oracle compare)
    val d = SketchOps
      .joinSizeEstimate(a, col("k"), Seq("z", "z").toDF("k"), col("k"))
      .head()
    assert(d.getLong(0) == 0L && d.getLong(1) >= 0L && d.isNullAt(2))
    // real self-join: never undercounts (min-of-rows is one-sided)
    val ev = Tables.events(spark, TestSpark.sf0001)
    val s = SketchOps.joinSizeEstimate(ev, col("user_id"), ev, col("user_id")).head()
    assert(s.getLong(1) >= s.getLong(0))
    assert(s.getLong(0) > 0L)
  }
}
