package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.RankOps

/** Property pins for the generalized cut-key rank machinery: every output
  * must be BIT-IDENTICAL to the window-function twin (`ntile`,
  * `row_number`) it replaces, across random corpora with heavy value ties,
  * multiple groups, and tiny/degenerate group sizes — the contract that let
  * `rfm_segments` / `customer_balance_pct` / `group_quantiles` /
  * `winsorized_stats` drop their corpus-scale sorts without touching their
  * DuckDB oracles. Tiny bin counts (nBins = 8) are used deliberately so
  * boundary ranks routinely land mid-bin and many rows share a bin — the
  * regime where off-by-one rank arithmetic would show.
  */
class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // (group, value) corpora: few groups, values drawn from a small domain so
  // ties are dense; ids made unique by index
  private val corpusGen: Gen[List[(String, Long)]] =
    Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-20L, 20L)
    } yield (g, v))

  private def toDf(rows: List[(String, Long)]) =
    rows.zipWithIndex
      .map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("grp", "v", "id")

  test("positions == per-group row_number over (v, id), dense ties, tiny bins") {
    val p = Prop.forAll(corpusGen) { rows =>
      val df = toDf(rows)
      val got = RankOps.positions(df, Seq("grp"), Seq("v", "id"), nBins = 8)
        .select(col("grp"), col("v"), col("id"), col("gr_pos"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      val want = df
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getInt(3).toLong)
        .toMap
      got == want
    }
    check(p)
  }

  test("rankBuckets == ntile(k) over (v, id) per group, any k, dense ties, any nBins") {
    // nBins down to 1 forces every row through the "boundary bin" path —
    // the rank arithmetic must hold when binning gives no pruning at all
    check(Prop.forAll(corpusGen, Gen.chooseNum(2, 7), Gen.oneOf(1, 2, 3, 8)) { (rows, k, nb) =>
      val df = toDf(rows)
      val expected = df
        .withColumn(
          "b",
          ntile(k).over(Window.partitionBy($"grp").orderBy($"v", $"id")))
        .select($"grp", $"id", $"b")
      val got = RankOps
        .rankBuckets(df, Seq("grp"), Seq("v", "id"), k, "b", nBins = nb)
        .select($"grp", $"id", $"b")
      got.except(expected).isEmpty && expected.except(got).isEmpty
    }, n = 25)
  }

  test("rankBuckets: single-valued group (one bin) and n < k still match ntile") {
    val df = (List.fill(9)(("a", 5L)) ++ List(("b", 1L), ("b", 2L)))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("grp", "v", "id")
    val expected = df
      .withColumn("b", ntile(5).over(Window.partitionBy($"grp").orderBy($"v", $"id")))
      .select($"grp", $"id", $"b")
    val got = RankOps
      .rankBuckets(df, Seq("grp"), Seq("v", "id"), 5, "b", nBins = 8)
      .select($"grp", $"id", $"b")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("keysAtRanks returns the exact order statistic at every rank 1..n") {
    check(Prop.forAll(corpusGen) { rows =>
      val df = toDf(rows)
      // every rank of every group, tagged by its rank
      val targets = df
        .groupBy($"grp")
        .agg(count(lit(1)).as("n"))
        .select($"grp", explode(sequence(lit(1L), $"n")).as("gr_trank"))
        .withColumn("gr_tid", $"gr_trank".cast("int"))
      val got = RankOps
        .keysAtRanks(df, Seq("grp"), Seq("v"), targets, nBins = 8)
        .select($"grp", $"gr_tid", $"v")
        .as[(String, Int, Long)]
        .collect()
        .toSet
      val expected = rows
        .groupBy(_._1)
        .flatMap { case (g, vs) =>
          vs.map(_._2).sorted.zipWithIndex.map { case (v, i) => (g, i + 1, v) }
        }
        .toSet
      got == expected
    }, n = 25)
  }

  test("keysAtRanksBy: gr_n-based rank expressions, gr_n carried to output") {
    check(Prop.forAll(corpusGen) { rows =>
      val df = toDf(rows)
      val got = RankOps
        .keysAtRanksBy(
          df,
          Seq("grp"),
          Seq("v"),
          Seq(0 -> lit(1L), 1 -> (expr("gr_n div 2") + 1L), 2 -> col("gr_n")),
          nBins = 8)
        .select($"grp", $"gr_tid", $"gr_n", $"v")
        .as[(String, Int, Long, Long)]
        .collect()
        .toSet
      val expected = rows
        .groupBy(_._1)
        .flatMap { case (g, vs) =>
          val s = vs.map(_._2).sorted
          val n = s.size.toLong
          Seq((g, 0, n, s.head), (g, 1, n, s((n / 2).toInt)), (g, 2, n, s.last))
        }
        .toSet
      got == expected
    }, n = 25)
  }

  test("keysAtRanks: ranks beyond the group size yield no row") {
    val df = List(("a", 1L), ("a", 2L)).zipWithIndex
      .map { case ((g, v), i) => (g, v, i.toLong) }.toDF("grp", "v", "id")
    val targets = Seq(("a", 1, 3L)).toDF("grp", "gr_tid", "gr_trank")
    assert(RankOps.keysAtRanks(df, Seq("grp"), Seq("v"), targets, nBins = 8).isEmpty)
  }

  test("multiNtileCuts + bucket expr == ntile(k) per dim, dense ties, any k/nBins") {
    // two independent orderings of one relation; w drawn from a tiny domain
    // so single-valued-dim groups (the tiebreak-fallback path) occur
    val gen2: Gen[List[(Long, Long)]] =
      Gen.nonEmptyListOf(for {
        v <- Gen.chooseNum(-20L, 20L)
        w <- Gen.chooseNum(0L, 2L)
      } yield (v, w))
    check(Prop.forAll(gen2, Gen.chooseNum(2, 7), Gen.oneOf(1, 2, 8)) { (rows, k, nb) =>
      val df = rows.zipWithIndex
        .map { case ((v, w), i) => (v, w, i.toLong) }
        .toDF("v", "w", "id")
      val expected = df
        .withColumn("b1", ntile(k).over(Window.orderBy($"v", $"id")))
        .withColumn("b2", ntile(k).over(Window.orderBy($"w", $"id")))
        .select($"id", $"b1", $"b2")
      val cuts = RankOps.multiNtileCuts(df, Seq(1 -> $"v", 2 -> $"w"), "id", k, nBins = nb)
      val got = df
        .withColumn("b1", RankOps.ntileBucketExprLit($"v", $"id", cuts(1), k))
        .withColumn("b2", RankOps.ntileBucketExprLit($"w", $"id", cuts(2), k))
        .select($"id", $"b1", $"b2")
      got.except(expected).isEmpty && expected.except(got).isEmpty
    }, n = 20)
  }

  test("multiNtileCuts: all-tied dim falls back to the tiebreak's range, still == ntile") {
    // every v identical — the degenerate shape must spread via id bins
    val df = (0 until 40).map(i => (7L, i.toLong)).toDF("v", "id")
    val expected = df
      .withColumn("b", ntile(5).over(Window.orderBy($"v", $"id")))
      .select($"id", $"b")
    val cuts = RankOps.multiNtileCuts(df, Seq(1 -> $"v"), "id", 5, nBins = 8)
    val got = df
      .withColumn("b", RankOps.ntileBucketExprLit($"v", $"id", cuts(1), 5))
      .select($"id", $"b")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("multiNtileCuts: empty base yields no cut keys, bucket expr falls to k") {
    val df = spark.emptyDataset[(Long, Long)].toDF("v", "id")
    val cuts = RankOps.multiNtileCuts(df, Seq(1 -> $"v"), "id", 4)
    assert(cuts(1).forall(_.isEmpty))
    assert(df.withColumn("b", RankOps.ntileBucketExprLit($"v", $"id", cuts(1), 4)).isEmpty)
  }

  test("rowsAboveRank == rows with row_number > cut, with exact positions, any nBins") {
    check(Prop.forAll(corpusGen, Gen.chooseNum(0L, 10L), Gen.oneOf(1, 2, 3, 8)) { (rows, cut, nb) =>
      val df = toDf(rows)
      val expected = df
        .withColumn(
          "gr_pos",
          row_number().over(Window.partitionBy($"grp").orderBy($"v", $"id")).cast("long"))
        .filter($"gr_pos" > cut)
        .select($"grp", $"id", $"gr_pos")
      val got = RankOps
        .rowsAboveRank(df, Seq("grp"), Seq("v", "id"), lit(cut), nBins = nb)
        .select($"grp", $"id", $"gr_pos")
      got.except(expected).isEmpty && expected.except(got).isEmpty
    }, n = 25)
  }

  test("rowsAboveRank >MaxDriverGroups: distributed fallback correct, plan stays bounded") {
    // 3 × MaxDriverGroups groups forces the fully-distributed path (the
    // driver-side literal path caps at 64 groups by design)
    val nGroups = RankOps.MaxDriverGroups * 3
    val rows = for {
      g <- 0 until nGroups
      i <- 0 until 7
    } yield (s"g$g", (i * 13 % 5).toLong, (g * 7 + i).toLong)
    val df = rows.toDF("grp", "v", "id")
    val got = RankOps.rowsAboveRank(df, Seq("grp"), Seq("v", "id"), lit(4L), nBins = 8)
    val expected = df
      .withColumn(
        "gr_pos",
        row_number().over(Window.partitionBy($"grp").orderBy($"v", $"id")).cast("long"))
      .filter($"gr_pos" > 4L)
      .select($"grp", $"id", $"gr_pos")
    assert(got.select($"grp", $"id", $"gr_pos").except(expected).isEmpty &&
      expected.except(got.select($"grp", $"id", $"gr_pos")).isEmpty)
    // plan shape: every rank window is PARTITIONED (by (grp, gr_bin) —
    // ≤ group-size rows per partition), and the keep relation arrives
    // broadcast — no corpus-scale global sort, no unbounded window
    val p = got.queryExecution.executedPlan.toString
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windowLines.nonEmpty, "fallback must rank inside boundary bins")
    windowLines.foreach { l =>
      assert(l.contains("gr_bin"),
        s"rank window must be partitioned by the bounded (grp, gr_bin) key: $l")
    }
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "keep set must broadcast onto the binned corpus")
    assert(!p.contains("CartesianProduct"), "no cartesian fan-out in the fallback")
  }
}
