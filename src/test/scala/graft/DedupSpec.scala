package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.sources.Tables

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.sf0001)

  test("exact dedup: survivors + groups partition the corpus") {
    val n = docs.count()
    val groups = DedupOps.exact(docs)
    assert(groups.agg(sum("n_dups")).head().getLong(0) == n)
    assert(DedupOps.exactSurvivors(docs).count() == groups.count())
  }

  test("sessionValue contract: file version invalidates, plan-keyed memo persists") {
    // round-11 verdict #7: the documented memo-invalidation contract,
    // enforced. File-backed sources carry a (path, length, mtime)
    // fingerprint — rewriting the files MUST recompute; non-file sources
    // key on the canonicalized plan alone, so an identical plan serves
    // the existing memo even when a fresh compute would differ (the
    // documented staleness under the driver's parquet-only contract).
    val dir = java.nio.file.Files.createTempDirectory("svspec").toFile.getAbsolutePath
    val path = s"$dir/t.parquet"
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(path)
    var calls = 0
    def memo(df: org.apache.spark.sql.DataFrame): Int =
      DedupOps.sessionValue(df, "svSpecFile") { calls += 1; calls }
    assert(memo(spark.read.parquet(path)) == 1)
    assert(memo(spark.read.parquet(path)) == 1, "unchanged files must memo-hit")
    Seq((2L, "b"), (3L, "c")).toDF("id", "s").write.mode("overwrite").parquet(path)
    assert(memo(spark.read.parquet(path)) == 2, "rewritten files must recompute")

    val mem = Seq((1L, "x")).toDF("id", "s")
    var c2 = 0
    def memo2(df: org.apache.spark.sql.DataFrame): Int =
      DedupOps.sessionValue(df, "svSpecMem") { c2 += 1; c2 }
    assert(memo2(mem) == 1)
    assert(memo2(mem) == 1, "identical non-file plan must serve the memo (documented staleness)")
  }

  test("incrementalStatus golden: exact / near / new classified against the base") {
    val df = Seq(
      (1L, "x y z w q r s t"), // base
      (2L, "a b c d e f g h"), // base
      (3L, "filler base words entirely unrelated tokens all"), // base
      (5L, "x y z w q r s t"), // batch: byte-identical to base 1
      (10L, "a b c d e f g zz"), // batch: J = 5/7 vs base 2
      (15L, "completely different words here now ok yes")) // batch: new
      .toDF("doc_id", "text")
    val got = DedupOps
      .incrementalStatus(df, batchMod = 5, n = 3, minJaccard = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    DedupOps.releaseShingleCaches()
    assert(got == Seq((5L, "exact_dup"), (10L, "near_dup"), (15L, "new")))
  }

  test("fingerprint dedup is case/whitespace-insensitive") {
    val df = Seq(
      (1L, "a b c"),
      (2L, "A   b C"),
      (3L, "totally different")).toDF("doc_id", "text")
    val out = DedupOps.fingerprintDedup(df).collect()
    assert(out.length == 2)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (3L, 1L)))
  }

  test("shingles: golden 3-grams, short docs empty") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val sh = df
      .select(
        col("doc_id"),
        DedupOps.shingles(graft.operators.TextOps.tokens(col("text")), 3).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L).isEmpty)
  }

  test("jaccard golden: identical docs 1.0, disjoint docs absent") {
    val df = Seq(
      (1L, "x y z w"),
      (2L, "x y z w"),
      (3L, "p q r s")).toDF("doc_id", "text")
    val pairs = DedupOps.jaccardPairs(df, 3, 0.0).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(5) == 1.0)
  }

  test("jaccard prefix filtering: corpus-hot shingle in EVERY doc, output stays exact") {
    // 60 docs all sharing the shingle "x y z" (df = 100% — the round-1
    // quadratic-blocking hazard) plus unique tails; one planted dup pair.
    // Prefix filtering must return exactly the naive-join answer.
    val docs = (0 until 60).map(i => (i.toLong, s"x y z u${i}a u${i}b u${i}c u${i}d")) ++
      Seq((100L, "p q r s t v w"), (101L, "p q r s t v w"))
    val df = docs.toDF("doc_id", "text")
    // naive expected: per-pair jaccard over 3-gram shingle sets
    def shingleSet(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      (i, ti) <- docs; (j, tj) <- docs if i < j
      si = shingleSet(ti); sj = shingleSet(tj)
      inter = si.intersect(sj).size
      if inter > 0
      jac = inter.toDouble / (si.size + sj.size - inter)
      if jac >= 0.5
    } yield (i, j, jac)).toSet
    val got = DedupOps
      .jaccardPairs(df, 3, 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
      .toSet
    assert(got == expected, s"got $got, want $expected")
    assert(got == Set((100L, 101L, 1.0)))
    DedupOps.releaseShingleCaches()
  }

  test("minhash LSH recovers the high-jaccard pairs (est within 0.25 of exact)") {
    val exact = DedupOps
      .jaccardPairs(docs, 3, 0.8)
      .select("a_id", "b_id", "jaccard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val est = DedupOps
      .minhashLsh(docs, 3, numPerm = 16, rowsPerBand = 4, minEst = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // recall on jaccard ≥ 0.8 pairs (16 perms, b=4/r=4 → P(candidate) ≈ 97% at j=0.8)
    val found = exact.keySet.intersect(est.keySet)
    assert(found.size.toDouble / exact.size >= 0.8, s"recall ${found.size}/${exact.size}")
    found.foreach { k => assert(math.abs(est(k) - exact(k)) <= 0.25) }
  }

  test("simhash: identical docs collide at hamming 0; near-dups within threshold") {
    val sig = DedupOps
      .simhash(Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(sig(1L) == sig(2L))
    val exactPairs = DedupOps
      .jaccardPairs(docs, 3, 0.9)
      .select("a_id", "b_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val simPairs = DedupOps
      .simhashPairs(docs, maxHamming = 5)
      .select("a_id", "b_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val found = exactPairs.intersect(simPairs)
    assert(found.size.toDouble / exactPairs.size >= 0.7, s"recall ${found.size}/${exactPairs.size}")
  }

  test("substring pairs: copy-with-additions found by containment, strangers absent") {
    val core = (1 to 20).map(i => s"core$i").mkString(" ")
    val docs = Seq(
      (1L, core), // the original
      (2L, s"lead in padding $core plus trailing extras here"), // contains all of doc 1
      (3L, (1 to 20).map(i => s"other$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val pairs = DedupOps
      .substringPairs(docs, minContain = 0.8)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
      .toMap
    DedupOps.releaseShingleCaches()
    assert(pairs.contains((1L, 2L)), "the containing pair must surface")
    assert(pairs((1L, 2L)) >= 0.8, "nearly every doc-1 fingerprint also appears in doc 2")
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L }, "no stranger pairs")
  }

  test("dupRateBySource: internal excess and cross-source overlap on a golden corpus") {
    val df = Seq(
      (1L, "alpha", "s1"), (2L, "alpha", "s1"), (3L, "alpha", "s2"),
      (4L, "beta", "s1"), (5L, "gamma", "s2"), (6L, "gamma", "s2"),
      (7L, "delta", "s3"))
      .toDF("doc_id", "text", "source")
    val got = DedupOps.dupRateBySource(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    DedupOps.releaseShingleCaches()
    // s1: 3 docs; "alpha"×2 internal excess 1; both alphas cross (s2 has one)
    assert(got("s1") == ((3L, 1L, 2L, 0.333333, 0.666667)))
    // s2: 3 docs; "gamma"×2 excess 1; the alpha crosses
    assert(got("s2") == ((3L, 1L, 1L, 0.333333, 0.333333)))
    // s3: unique everywhere
    assert(got("s3") == ((1L, 0L, 0L, 0.0, 0.0)))
    // identity: global exact-dedup excess = within-source excess + the
    // cross-source collapse (distinct (source, text) minus distinct text)
    val withinExcess = got.values.map(_._2).sum
    val globalExcess = df.count() - DedupOps.exact(df).count()
    val crossCollapse =
      df.select(col("source"), col("text")).distinct().count() -
        df.select(col("text")).distinct().count()
    assert(globalExcess == withinExcess + crossCollapse)
  }
}
