package graft

import graft.operators.{DedupOps, TextOps}
import graft.sources.Tables

/** Data-curation operators: repetition signals, decontamination,
  * per-source quality rollup.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals golden: alternating and repeated texts") {
    val docs = Seq(
      // "a b" x3: bigrams a b, b a, a b, b a, a b → top 3/5; 5-grams
      // "a b a b a", "b a b a b" distinct → dup 0
      (1L, "a b a b a b"),
      // same 5-gram repeated: 5-grams x w x y z (1..4 distinct of 8)
      (2L, "x w x y z x w x y z x w"),
      // too short for any n-gram
      (3L, "q"))
      .toDF("doc_id", "text")
    val got = TextOps
      .repetitionSignals(docs)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    DedupOps.releaseShingleCaches()
    assert(got(0) == ((1L, 6, 3L, 0.6, 0.0)))
    // doc 2: 12 tokens → 11 bigrams, top "x w" ×3 → 3/11; 8 5-grams, 5
    // distinct ("x w x y z","w x y z x","x y z x w","y z x w x","z x w x y")
    // → dup 3/8
    assert(got(1) == ((2L, 12, 3L, math.rint(3.0 / 11 * 1e6) / 1e6, 0.375)))
    assert(got(2) == ((3L, 1, 0L, 0.0, 0.0)))
  }

  test("decontaminate golden: planted 8-gram overlap") {
    val eight = "c1 c2 c3 c4 c5 c6 c7 c8"
    val docs = Seq(
      (0L, s"$eight tail tokens here"), // eval doc (0 % 7 == 0)
      (1L, s"lead in words $eight"), // contaminated via the shared 8-gram
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"), // clean, 2 distinct 8-grams
      (3L, "short text")) // no 8-grams at all
      .toDF("doc_id", "text")
    val got = DedupOps
      .decontaminate(docs, n = 8, evalMod = 7)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    DedupOps.releaseShingleCaches()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), "eval doc excluded, train ordered")
    assert(got(0)._4 == 1 && got(0)._3 >= 1L, "doc 1 shares the planted 8-gram")
    assert(got(1) == ((2L, 2, 0L, 0)))
    assert(got(2) == ((3L, 0, 0L, 0)))
  }

  test("decontaminate on fixtures: counts bounded by gram counts") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rows = DedupOps.decontaminate(docs).collect()
    DedupOps.releaseShingleCaches()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 50 != 0, "eval docs excluded")
      assert(r.getLong(2) <= r.getInt(1).toLong, "hits bounded by doc's gram count")
      assert((r.getInt(3) == 1) == (r.getLong(2) > 0))
    }
  }

  test("pack_sequences == reference greedy packer per (lang, shard)") {
    // small fixture: 1 shard + 512-token bins so multiple bins fill
    val docs = Tables.documents(spark, TestSpark.sf0001)
    import org.apache.spark.sql.functions.{concat, lit, pmod, size}
    val perDoc = docs
      .select(
        $"doc_id",
        $"lang",
        size(TextOps.tokens($"text")).as("nt"),
        pmod(
          graft.functions.PortableHash.hash60(concat(lit("shard:"), $"doc_id".cast("string"))),
          lit(1L)).as("shard"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val want = perDoc.toSeq
      .groupBy(t => (t._2, t._4))
      .toSeq
      .flatMap { case ((lang, shard), rows) =>
        var cum = 0L
        rows.sortBy(_._1).map { case (_, _, nt, _) =>
          val bin = cum / 512L
          cum += nt
          ((lang, shard, bin), nt.toLong)
        }
      }
      .groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_._2).sum)) }
    val got = TextOps
      .packSequences(docs, binTokens = 512, nShards = 1)
      .collect()
      .map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == want)
    assert(got.keys.map(_._3).max >= 1L, "fixture should fill more than one bin")
  }

  test("doc_chunks: full coverage, correct overlap, golden small cases") {
    val docs = Seq(
      (1L, (1 to 64).map(i => s"t$i").mkString(" ")), // exactly one chunk
      (2L, (1 to 65).map(i => s"t$i").mkString(" ")), // spills into a 17-token tail
      (3L, "a b c")) // short doc → single short chunk
      .toDF("doc_id", "text")
    val got = TextOps
      .chunkDocs(docs, chunkSize = 64, overlap = 16)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    DedupOps.releaseShingleCaches()
    assert(got.toSeq == Seq((1L, 0, 64), (2L, 0, 64), (2L, 1, 17), (3L, 0, 3)))
  }

  test("doc_chunks covers every token of every fixture doc") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val chunks = TextOps
      .chunkDocs(docs)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    DedupOps.releaseShingleCaches()
    val nTokens = docs
      .select($"doc_id", org.apache.spark.sql.functions.size(TextOps.tokens($"text")).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = nTokens(id)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0 until cs.length))
      // last chunk must reach the final token: start + len == n
      val last = sorted.last
      assert(last._2 * 48 + last._3 == n, s"doc $id: chunks don't cover $n tokens")
      // every chunk except possibly the last is full-size
      assert(sorted.init.forall(_._3 == 64))
    }
  }

  test("source_quality consistent with per-doc quality") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rollup = SparkEntry.queries("source_quality")(spark, TestSpark.sf0001).collect()
    val perDoc = TextOps
      .quality(docs)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .collect()
    val bySource = perDoc.groupBy(_.getAs[String]("source"))
    assert(rollup.map(_.getString(0)).toSeq == bySource.keys.toSeq.sorted)
    rollup.foreach { r =>
      val g = bySource(r.getString(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.count(_.getAs[String]("quality_bucket") == "high").toLong)
      assert(r.getLong(3) == g.count(_.getAs[String]("quality_bucket") == "low").toLong)
    }
  }
}
