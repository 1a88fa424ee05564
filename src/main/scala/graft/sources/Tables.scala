package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thin loaders for the driver-generated Parquet tables
  * (/root/repo/TESTDATA.md). Explicit-by-name so Catalyst sees a stable
  * relation per table; schema comes from Parquet footers (deterministic —
  * no inference).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanosecond
    * timestamp, so sessions set `spark.sql.legacy.parquet.nanosAsLong` and
    * this loader exposes both the raw nanos (`ts_ns: long`) and a
    * microsecond-truncated `ts: timestamp` (integer DIV — double division
    * would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts_ns", col("ts").cast("long"))
      // micros: DuckDB (the oracle) truncates parquet nanos to TIMESTAMP(us),
      // so cross-engine time arithmetic sticks to microseconds
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
