package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint recovery + exactly-once file sink: stop a stateful stream
  * mid-corpus, restart it from the checkpoint, and verify the sink holds
  * exactly one row per key — state (dedup keys) and source offsets both
  * survive the restart. This is the durability contract every long-lived
  * ingestion pipeline leans on; the test kills the query between
  * micro-batches exactly where a real executor loss would.
  */
class CheckpointSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("v", DoubleType)))

  test("stateful dedup stream resumes from checkpoint with exactly-once sink output") {
    val root = Files.createTempDirectory("ckpt_spec")
    val (src, sink, ckpt) =
      (s"$root/src", s"$root/sink", s"$root/ckpt")
    Files.createDirectories(java.nio.file.Paths.get(src))

    def writeBatch(ids: Seq[Long], tag: String): Unit = {
      import spark.implicits._
      ids.map(i => (i, i * 1.5)).toDF("event_id", "v")
        .coalesce(1).write.mode("append").parquet(src)
    }
    def runUntilDrained(): Unit = {
      val q = spark.readStream
        .schema(schema)
        .parquet(src)
        .dropDuplicates("event_id")
        .writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }

    // phase 1: ids 1-100 with in-batch duplicates
    writeBatch((1L to 100L) ++ (1L to 20L), "a")
    runUntilDrained()
    // phase 2 arrives AFTER the stream was stopped: overlap 50-100 must be
    // dropped by state recovered from the checkpoint, 101-150 appended
    writeBatch(50L to 150L, "b")
    runUntilDrained()

    val out = spark.read.parquet(sink).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == (1L to 150L), "exactly one row per key across the restart")
  }
}
