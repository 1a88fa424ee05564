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
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) (read as
    * LongType under `spark.sql.legacy.parquet.nanosAsLong`) and
    * TIMESTAMP(MICROS) (read as TimestampType) across testdata generations.
    * Branch on the footer schema and normalize to the columns every
    * downstream query uses: integer `ts_us`/`ts_ns` plus a microsecond
    * `ts: timestamp`. Integer arithmetic throughout — double division would
    * lose precision above 2^53 ns.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventsTs(load(spark, sfDir, "events"))

  /** The generation branch, reusable by any loader of an events-shaped
    * relation (tools and streaming readers included — a streaming DataFrame
    * goes through the same column ops). Only the two types the generations
    * have actually shipped are accepted; anything else fails LOUDLY here
    * rather than silently casting to null timestamps downstream.
    */
  private[graft] def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumn("ts_ns", col("ts").cast("long"))
          // micros: DuckDB (the oracle) truncates parquet nanos to
          // TIMESTAMP(us), so cross-engine arithmetic sticks to microseconds
          .withColumn("ts_us", expr("ts_ns DIV 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType =>
        // TIMESTAMP_NTZ → TIMESTAMP is identity under the UTC session tz
        // every entrypoint sets; unix_micros then yields exact integers
        raw
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported parquet type $other " +
            "(known generations: INT64 nanos-as-long, TIMESTAMP micros)")
    }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
