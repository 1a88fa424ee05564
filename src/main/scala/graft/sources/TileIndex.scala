package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tile-set sources: the reference's "table" is a list of raster-tile URIs
  * obtained from a GeoJSON index object or shipped as a flat text list
  * (reference: compute_histogram/main.py:60-79,
  * compute_histogram/csv/bio_intact_list.txt).
  *
  * In the Spark engine a tile set is just a one-column DataFrame of URIs;
  * the downstream value table is whatever source those URIs resolve to
  * (here: the driver's Parquet tables — a faithful GeoTIFF reader would be a
  * DataSource V2, out of scope offline per SURVEY §7.3).
  */
object TileIndex {

  /** S1 — GeoJSON tile-index scan: parse the index document and project
    * `features[*].properties.name` (reference: compute_histogram/main.py:60-74).
    */
  def fromGeoJson(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .json(path)
      .select(explode(col("features")).as("feature"))
      .select(col("feature.properties.name").as("tile_uri"))

  /** S4 — flat text tile list, one URI per line
    * (reference: compute_histogram/csv/bio_intact_list.txt:1-248).
    */
  def fromTextList(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "tile_uri")

  /** S2 — split an `s3://bucket/key` URI into bucket and key columns
    * (reference: compute_histogram/main.py:77-79). Spark's S3A connector
    * makes this unnecessary for real I/O; kept as a scalar surface.
    */
  def s3Bucket(uri: Column): Column = parse_url(uri, lit("HOST"))
  def s3Key(uri: Column): Column = regexp_replace(parse_url(uri, lit("PATH")), "^/", "")

  def withS3Parts(tiles: DataFrame): DataFrame =
    tiles
      .withColumn("bucket", s3Bucket(col("tile_uri")))
      .withColumn("key", s3Key(col("tile_uri")))
}
