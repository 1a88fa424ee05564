package graft

import org.apache.spark.sql.functions._

import graft.operators.EvalOps

/** EvalOps.isotonicFromBins: the minimax form equals the classic
  * sequential pool-adjacent-violators fit (weighted), output is
  * monotone, and already-monotone inputs pass through unchanged.
  */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def bins(rows: (Long, Long, Long)*) = rows.toSeq.toDF("bin", "n", "n_pos")

  /** Classic weighted PAV: pool adjacent blocks while a violator exists. */
  private def pavRef(rows: Seq[(Long, Long, Long)]): Map[Long, Double] = {
    case class Block(bins: List[Long], n: Long, pos: Long) {
      def mean: Double = pos.toDouble / n.toDouble
    }
    var blocks = rows.sortBy(_._1).map(r => Block(List(r._1), r._2, r._3)).toList
    var changed = true
    while (changed) {
      changed = false
      val out = scala.collection.mutable.ListBuffer.empty[Block]
      for (b <- blocks) {
        out += b
        while (out.length >= 2 && out(out.length - 2).mean > out.last.mean) {
          val r = out.remove(out.length - 1)
          val l = out.remove(out.length - 1)
          out += Block(l.bins ++ r.bins, l.n + r.n, l.pos + r.pos)
          changed = true
        }
      }
      blocks = out.toList
    }
    blocks.flatMap(b => b.bins.map(_ -> b.mean)).toMap
  }

  test("minimax fit equals sequential weighted PAV on a violating profile") {
    val rows = Seq(
      (0L, 10L, 5L), (1L, 20L, 4L), (2L, 5L, 4L), (3L, 40L, 18L),
      (4L, 8L, 3L), (5L, 30L, 21L), (6L, 12L, 4L), (7L, 25L, 20L))
    val want = pavRef(rows)
    val got = EvalOps.isotonicFromBins(bins(rows: _*)).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    for ((b, m) <- want)
      assert(math.abs(got(b) - m) < 2e-6, s"bin $b: ${got(b)} vs PAV $m")
  }

  test("output is nondecreasing in bin") {
    val rows = (0L until 12L).map(b => (b, 10L + b, (b * 7 + 3) % 11))
    val iso = EvalOps.isotonicFromBins(bins(rows: _*)).collect().map(_.getLong(4))
    assert(iso.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)), iso.toSeq.toString)
  }

  test("already-monotone rates pass through as themselves") {
    val rows = Seq((0L, 10L, 1L), (1L, 10L, 3L), (2L, 10L, 5L), (3L, 10L, 9L))
    val got = EvalOps.isotonicFromBins(bins(rows: _*)).collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(5) - r.getDouble(3)) < 2e-6, s"bin ${r.getLong(0)}")
    }
  }

  test("heavier block dominates the pooled mean") {
    // bins 0 (n=90, rate 0.9) and 1 (n=10, rate 0.1) pool to 82/100
    val got = EvalOps.isotonicFromBins(bins((0L, 90L, 81L), (1L, 10L, 1L))).collect()
    got.foreach(r => assert(math.abs(r.getDouble(5) - 0.82) < 2e-6))
  }
}
