package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.TileIndex

class TileIndexSpec extends SparkSpec {

  private def writeFixture(name: String, content: String): String = {
    val dir = Paths.get("target", "fixtures")
    Files.createDirectories(dir)
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("S1: GeoJSON index → tile URIs") {
    // shape of the reference's tiles.geojson (features[*].properties.name)
    val path = writeFixture(
      "tiles.json",
      """{"type": "FeatureCollection", "features": [
        |  {"type": "Feature", "properties": {"name": "s3://bkt/a/0000-0000.tif"}, "geometry": null},
        |  {"type": "Feature", "properties": {"name": "s3://bkt/a/0000-0001.tif"}, "geometry": null}
        |]}""".stripMargin)
    val tiles = TileIndex.fromGeoJson(spark, path).collect().map(_.getString(0))
    assert(
      tiles.toSeq == Seq("s3://bkt/a/0000-0000.tif", "s3://bkt/a/0000-0001.tif"))
  }

  test("S4 + S2: text list → URIs with bucket/key split") {
    val path = writeFixture(
      "tiles.txt",
      "s3://gfw-data/bio/10N_010E.tif\ns3://gfw-data/bio/10N_020E.tif\n")
    val out = TileIndex
      .withS3Parts(TileIndex.fromTextList(spark, path))
      .orderBy("tile_uri")
      .collect()
    assert(out.length == 2)
    assert(out.head.getString(1) == "gfw-data")
    assert(out.head.getString(2) == "bio/10N_010E.tif")
  }
}
