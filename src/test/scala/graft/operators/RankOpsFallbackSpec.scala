package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Pins the round-8 degenerate-group fallback: a group whose LEADING order
  * column is single-valued must not collapse into one histogram bin when a
  * numeric tiebreak column follows — it bins on the tiebreak's range
  * instead, so the step-4 rank window keeps bounded partitions even for
  * all-tied groups (the one shape the advisor flagged as reintroducing the
  * group-scale sort at extreme scale). In package graft.operators to reach
  * the package-private binned/groupStats/cumBins internals.
  */
class RankOpsFallbackSpec extends graft.SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("all-tied group with numeric tiebreak spreads across bins, not one") {
    // 200 rows, every v identical — without the fallback all 200 land in
    // bin 0 and the boundary rank window sorts the whole group in one task
    val df = (0 until 200).map(i => ("a", 7L, i.toLong)).toDF("grp", "v", "id")
    val st = RankOps.groupStats(df, Seq("grp"), Seq("v", "id"))
    val bins = RankOps
      .binned(df, Seq("grp"), Seq("v", "id"), st, nBins = 8)
      .select($"gr_bin").distinct().count()
    assert(bins == 8L, s"expected the tiebreak fallback to use all 8 bins, got $bins")
  }

  test("fallback bins are monotonic in the (v, id) lexicographic key") {
    val df = (0 until 100).map(i => ("a", 7L, (99 - i).toLong)).toDF("grp", "v", "id")
    val st = RankOps.groupStats(df, Seq("grp"), Seq("v", "id"))
    val binById = RankOps
      .binned(df, Seq("grp"), Seq("v", "id"), st, nBins = 8)
      .select($"id", $"gr_bin").as[(Long, Int)].collect().sortBy(_._1).map(_._2)
    assert(binById.zip(binById.tail).forall { case (a, b) => a <= b })
  }

  test("rankBuckets == ntile on corpora mixing all-tied and spread groups") {
    // group "t" is entirely tied on v (fallback path); group "s" is spread
    // (normal path); group "m" has a tied majority value but is NOT
    // degenerate (hi > lo, so the head-bin path must handle its ties)
    val gen: Gen[List[(String, Long)]] = Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("t", "s", "m")
      v <- g match {
        case "t" => Gen.const(5L)
        case "m" => Gen.frequency(4 -> Gen.const(3L), 1 -> Gen.chooseNum(0L, 9L))
        case _   => Gen.chooseNum(-50L, 50L)
      }
    } yield (g, v))
    check(Prop.forAll(gen, Gen.chooseNum(2, 6)) { (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("grp", "v", "id")
      val expected = df
        .withColumn("b", ntile(k).over(Window.partitionBy($"grp").orderBy($"v", $"id")))
        .select($"grp", $"id", $"b")
      val got = RankOps
        .rankBuckets(df, Seq("grp"), Seq("v", "id"), k, "b", nBins = 8)
        .select($"grp", $"id", $"b")
      got.except(expected).isEmpty && expected.except(got).isEmpty
    }, n = 20)
  }

  test("rowsAboveRank keeps exact positions through the fallback path") {
    val df = (0 until 60).map(i => ("a", 1L, i.toLong)).toDF("grp", "v", "id")
    val expected = df
      .withColumn(
        "gr_pos",
        row_number().over(Window.partitionBy($"grp").orderBy($"v", $"id")).cast("long"))
      .filter($"gr_pos" > 40L)
      .select($"id", $"gr_pos")
    val got = RankOps
      .rowsAboveRank(df, Seq("grp"), Seq("v", "id"), lit(40L), nBins = 8)
      .select($"id", $"gr_pos")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("non-numeric tiebreak: degenerate group falls back to one bin, still correct") {
    val df = (0 until 30).map(i => ("a", 7L, f"id_$i%03d")).toDF("grp", "v", "sid")
    val st = RankOps.groupStats(df, Seq("grp"), Seq("v", "sid"))
    val bins = RankOps
      .binned(df, Seq("grp"), Seq("v", "sid"), st, nBins = 8)
      .select($"gr_bin").distinct().count()
    assert(bins == 1L, "string tiebreak cannot drive bin arithmetic — documented single-bin trade")
    val expected = df
      .withColumn("b", ntile(4).over(Window.partitionBy($"grp").orderBy($"v", $"sid")))
      .select($"sid", $"b")
    val got = RankOps
      .rankBuckets(df, Seq("grp"), Seq("v", "sid"), 4, "b", nBins = 8)
      .select($"sid", $"b")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }
}
