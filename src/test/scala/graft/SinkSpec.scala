package graft

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Tables}

/** Partitioned sorted parquet sink: directory layout, roundtrip
  * fidelity, per-file sortedness, and the small-files guard.
  */
class SinkSpec extends SparkSpec {

  private val outDir = "target/sink_spec/docs_by_lang"

  test("partitioned write: hive layout, lossless roundtrip, sorted files, no fan-out") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    Sinks.writePartitionedSorted(docs, outDir, Seq("lang"), Seq("doc_id"))

    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    val dirs = new java.io.File(outDir)
      .listFiles()
      .filter(_.isDirectory)
      .map(_.getName)
      .toSet
    assert(dirs == langs.map(l => s"lang=$l"), "one hive-style directory per language")

    val back = spark.read.parquet(outDir)
    assert(back.count() == docs.count())
    assert(
      back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq,
      "roundtrip preserves every row")

    // per-file sortedness: within each physical file, doc_id ascending —
    // the property that gives parquet min/max stats their pruning power
    val perFile = back
      .select(input_file_name().as("file"), col("doc_id"))
      .collect()
      .groupBy(_.getString(0))
    perFile.foreach { case (file, rows) =>
      val ids = rows.map(_.getLong(1)).toSeq
      assert(ids == ids.sorted, s"unsorted doc_ids in $file")
    }

    // no small-files fan-out: repartition-by-partition-col means each
    // language directory holds ONE data file at this scale, not one per task
    dirs.foreach { d =>
      val files = new java.io.File(s"$outDir/$d").listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"$d has $files files; expected the repartition to prevent fan-out")
    }
  }
}
