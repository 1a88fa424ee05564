package graft

import graft.operators.{CurationOps, DedupOps}
import graft.sources.Tables

/** Corpus-curation operators: span dedup, entropy, Gopher gate, BM25,
  * stratified sampling.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("span dedup golden: shared 8-token prefix is one duplicated span") {
    val eight = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$eight i j"), // spans: [a..h] (dup), [i j]
      (2L, s"$eight x y"), // spans: [a..h] (dup), [x y]
      (3L, "z z z")) // one short span, unique
      .toDF("doc_id", "text")
    val got = CurationOps
      .spanDedup(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    DedupOps.releaseShingleCaches()
    assert(got.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0)))
  }

  test("ngramNovelty golden: shared prefix halves novelty; short docs report null") {
    val eight = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$eight i"), // grams [a..h] (shared), [b..i] (unique) → 0.5
      (2L, s"$eight x"), // grams [a..h] (shared), [b..x] (unique) → 0.5
      (3L, "p q r s t u v w"), // one unique gram → 1.0
      (4L, "z z")) // < 8 tokens → no grams
      .toDF("doc_id", "text")
    val out = DedupOps.ngramNovelty(docs, n = 8).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    DedupOps.releaseShingleCaches()
    assert(out(1L) == ((2L, 1L, Some(0.5))))
    assert(out(2L) == ((2L, 1L, Some(0.5))))
    assert(out(3L) == ((1L, 1L, Some(1.0))))
    assert(out(4L) == ((0L, 0L, None)))
  }

  test("patternScan golden: PII fixtures counted per source, corpus-free patterns zero") {
    val docs = Seq(
      (1L, "contact bob@example.com or eve@test.org today", "s1"),
      (2L, "server at 10.0.0.1 and 192.168.1.1 up", "s1"),
      (3L, "no pii here at all", "s2"))
      .toDF("doc_id", "text", "source")
    val got = CurationOps
      .patternScan(docs, Seq("email" -> "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}",
        "ipv4" -> "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq(
      ("s1", "email", 2L, 1L, 2L),
      ("s1", "ipv4", 2L, 1L, 2L),
      ("s2", "email", 1L, 0L, 0L),
      ("s2", "ipv4", 1L, 0L, 0L)))
  }

  test("redactPii golden: typed placeholders, non-PII text untouched") {
    val docs = Seq(
      (1L, "mail bob@example.com from 10.0.0.1 now"),
      (2L, "plain text stays put"))
      .toDF("doc_id", "text")
    val got = CurationOps.redactPii(docs).orderBy("doc_id").collect().map(_.getString(1))
    assert(got(0) == "mail <EMAIL> from <IPV4> now")
    assert(got(1) == "plain text stays put")
  }

  test("qualityClassifier: partition-invariant (exact-integer GD) and sane") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val a = CurationOps.qualityClassifier(docs).collect().head
    DedupOps.releaseShingleCaches()
    val b = CurationOps.qualityClassifier(docs.repartition(7)).collect().head
    DedupOps.releaseShingleCaches()
    // the whole point of the nano-integer design: bit-identical under any
    // partitioning (float-sum GD would not be)
    assert(a == b)
    assert(a.getLong(0) == docs.count())
    val acc = a.getDouble(5)
    assert(acc >= 0.0 && acc <= 1.0)
    // stopword-percent weight must move POSITIVE: the label requires the
    // stopword ratio in-band and the corpus is built around that band
    assert(a.getDouble(3) != 0.0 || a.getDouble(4) != 0.0)
  }

  test("dsirWeights: covers the corpus; target-language docs score higher on average") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rows = CurationOps.dsirWeights(docs, targetLang = "en").collect()
    DedupOps.releaseShingleCaches()
    assert(rows.length == docs.count())
    val (en, rest) = rows.partition(_.getString(1) == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    // E[log w] under the target slice is the KL(target ‖ raw) estimate — it
    // must exceed the raw-pool mean (which mixes in the off-target mass)
    def mean(xs: Array[Double]) = xs.sum / xs.length
    assert(mean(en.map(_.getDouble(3))) > mean(rest.map(_.getDouble(3))))
  }

  test("mixtureBudget: weights normalize, allocation covers the budget, epochs consistent") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rows = CurationOps.mixtureBudget(docs, budgetTokens = 100000L).collect()
    assert(rows.nonEmpty)
    val weights = rows.map(_.getDouble(3))
    assert(math.abs(weights.sum - 1.0) < 1e-4)
    // truncation loses < 1 token per source
    val targets = rows.map(_.getLong(4))
    assert(targets.sum <= 100000L && targets.sum >= 100000L - rows.length)
    rows.foreach { r =>
      val (avail, target, epochs) = (r.getLong(2), r.getLong(4), r.getDouble(5))
      assert(avail > 0)
      // epochs is the repeat factor of the PRE-truncation allocation:
      // truncating target loses < 1 token, i.e. < 1/avail in epochs
      assert(math.abs(epochs - target.toDouble / avail) < 1.0 / avail + 1e-6)
    }
  }

  test("entropy golden: uniform two-token doc is ln 2, constant doc is 0") {
    val docs = Seq((1L, "a a b b"), (2L, "c c c")).toDF("doc_id", "text")
    val got = CurationOps
      .docEntropy(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0)._1 == 1L && got(0)._2 == 4L && got(0)._3 == 2L)
    assert(math.abs(got(0)._4 - math.log(2)) < 1e-5, "H(½,½) = ln 2")
    assert(got(1) == ((2L, 3L, 1L, 0.0)), "single-token distribution has zero entropy")
  }

  test("gopher rules golden: each rule fails on its crafted violator") {
    // 52 distinct-ish 3-char tokens incl. two stopwords → passes all rules
    val good = (1 to 50).map(i => f"w$i%03d").mkString("the of ", " ", "")
    val docs = Seq(
      (1L, good),
      (2L, "the of tok one two"), // fails ok_len only (5 tokens < 50)
      (3L, (1 to 50).map(_ => "a").mkString("the of ", " ", "")), // 1-char + repetitive
      (4L, good.replace("the of ", "xx1 xx2 "))) // no stopwords
      .toDF("doc_id", "text")
    val got = CurationOps
      .gopherRules(docs)
      .collect()
      .map(r =>
        (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getInt(7)))
    assert(got(0) == ((1L, 1, 1, 1, 1, 1, 1)), "well-formed doc passes all rules")
    assert(got(1)._2 == 0 && got(1)._7 == 0, "short doc fails ok_len and overall")
    val d3 = got(2)
    assert(d3._5 == 0 && d3._6 == 0, "single-char spam fails ok_short and ok_rep")
    assert(got(3)._4 == 0 && got(3)._7 == 0, "stopword-free doc fails ok_stop")
  }

  test("bm25 golden: higher tf at equal length ranks first; scores positive") {
    val docs = Seq(
      (1L, "spark spark x"),
      (2L, "spark x x"),
      (3L, "y y y")) // no query terms → absent from results
      .toDF("doc_id", "text")
    val got = CurationOps
      .bm25(docs, Seq("spark", "window", "hash"), topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "tf=2 beats tf=1 at equal dl; doc 3 absent")
    assert(got.forall(_._2 > 0L), "Lucene idf variant keeps scores positive")
    assert(got.map(_._3).toSeq == Seq(1, 2))
  }

  test("stratified sample: exactly min(k, stratum size) kept, deterministic") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val a = CurationOps.stratifiedSample(docs, k = 10).collect()
    val b = CurationOps.stratifiedSample(docs, k = 10).collect()
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq, "hash-rank sampling is run-deterministic")
    a.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept == math.min(10L, n), s"stratum ${r.getString(0)}")
      assert(r.getLong(3) > 0L)
    }
  }

  test("source mixture: weights normalize, sqrt damping flattens the raw shares") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rows = CurationOps
      .sourceMixture(docs, budget = 1000)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val wSum = rows.map(_._3).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    val total = rows.map(_._2).sum.toDouble
    rows.filter(_._2 > 0).foreach { case (s, n, w) =>
      val raw = n / total
      if (raw < 1.0 / rows.length) assert(w >= raw - 1e-9, s"$s: small source damped up")
      if (raw > 1.0 / rows.length) assert(w <= raw + 1e-9, s"$s: large source damped down")
    }
  }

  test("lm buckets: terciles partition the corpus, mean NLL rises head -> tail") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rows = CurationOps
      .lmBuckets(docs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    DedupOps.releaseShingleCaches()
    assert(rows.map(_._1).toSeq == Seq("head", "middle", "tail"))
    assert(rows.map(_._2).sum == docs.count())
    assert(rows(0)._3 <= rows(1)._3 && rows(1)._3 <= rows(2)._3, "NLL ordered by bucket")
  }

  test("lm buckets: histogram cut keys reproduce ntile(3) exactly for every n mod 3") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    // 48/49/50 docs → n ≡ 0/1/2 (mod 3): exercises all three ntile
    // size-split cases the boundary-rank arithmetic must reproduce
    for (n <- Seq(48, 49, 50)) {
      val sub = docs.filter(col("doc_id") < n)
      val got = CurationOps
        .lmBuckets(sub)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      DedupOps.releaseShingleCaches()
      val ref = graft.operators.TextOps
        .unigramNll(sub)
        .withColumn(
          "bucket",
          ntile(3).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("avg_nll"), col("doc_id"))))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(round(col("avg_nll") * lit(1e9)).cast("long")).as("sum_nll_nano"))
        .select(
          when(col("bucket") === 1, "head")
            .when(col("bucket") === 2, "middle")
            .otherwise("tail")
            .as("bucket"),
          col("n_docs"),
          col("sum_nll_nano"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      DedupOps.releaseShingleCaches()
      assert(got == ref, s"n=$n: histogram cutpoints diverge from ntile reference")
    }
  }

  test("lm buckets: all-identical corpus (hi == lo) splits 3/2/2 by doc_id alone") {
    // every doc has the same avg_nll → the histogram degenerates to one
    // bin and the cut keys are decided purely by the doc_id tie-break;
    // ntile(3) over 7 rows must still split 3/2/2
    val docs = (0L until 7L).map(i => (i, "alpha beta gamma")).toDF("doc_id", "text")
    val rows = CurationOps
      .lmBuckets(docs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toMap
    DedupOps.releaseShingleCaches()
    assert(rows == Map("head" -> 3L, "middle" -> 2L, "tail" -> 2L), rows.toString)
  }

  test("lm buckets: single doc lands alone in head; two docs split head/middle") {
    val one = Seq((0L, "a b c")).toDF("doc_id", "text")
    val got1 = CurationOps.lmBuckets(one).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    DedupOps.releaseShingleCaches()
    assert(got1 == Map("head" -> 1L), got1.toString)
    val two = Seq((0L, "a b c"), (1L, "a b d")).toDF("doc_id", "text")
    val got2 = CurationOps.lmBuckets(two).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    DedupOps.releaseShingleCaches()
    assert(got2 == Map("head" -> 1L, "middle" -> 1L), got2.toString)
  }

  test("fixture smoke: every curation query returns rows at sf0.001") {
    for ((name, fn) <- CurationQueries.queries) {
      val n = fn(spark, TestSpark.sf0001).count()
      DedupOps.releaseShingleCaches()
      assert(n > 0, name)
    }
  }
  test("bpe merge candidates golden: weighted pair counts over the vocab") {
    // vocab: spark×3, lake×1, park×1 — "ar","pa","rk" appear in 2 words
    // with weight 3+1=4; "sp" only in spark (3); rest weight 1
    val docs = Seq((1L, "spark spark lake"), (2L, "spark park")).toDF("doc_id", "text")
    val got = CurationOps
      .bpeMergeCandidates(docs, k = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("ar", 4L, 2L), ("pa", 4L, 2L), ("rk", 4L, 2L), ("sp", 3L, 1L)))
  }
  test("pipeline_full funnel is monotone per source and globally lossy-only") {
    val rows = CurationQueries.queries("pipeline_full")(spark, TestSpark.sf0001).collect()
    DedupOps.releaseShingleCaches()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, c, g) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= d && d >= c && c >= g, s"funnel must only shrink: $r")
      if (g > 0) assert(r.getLong(5) > 0, "surviving docs carry tokens")
    }
  }
}
