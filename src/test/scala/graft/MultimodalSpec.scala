package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asMedia: payload bytes are the utf-8 text, mime attached") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val r = MultimodalOps.asMedia(df).head()
    assert(r.getAs[Array[Byte]]("payload").toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(r.getString(2) == "text/plain")
  }

  test("stub decoder: deterministic, correct byte counts, fixed dim") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val feats = MultimodalOps.mediaFeatures(docs, dim = 8)
    val n = docs.count()
    assert(feats.count() == n)
    val row = feats.orderBy("doc_id").head()
    assert(row.getAs[scala.collection.Seq[Float]]("feat").length == 8)
    // n_bytes matches the engine-side octet_length of the same payload
    val mismatch = MultimodalOps
      .asMedia(docs)
      .select(col("doc_id"), octet_length(col("payload")).as("ob"))
      .join(feats.select(col("doc_id"), col("n_bytes")), "doc_id")
      .filter(col("ob") =!= col("n_bytes"))
      .count()
    assert(mismatch == 0)
    // determinism: run twice, identical checksums
    val a = feats.select("doc_id", "checksum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = MultimodalOps
      .mediaFeatures(docs, dim = 8)
      .select("doc_id", "checksum")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(a == b)
  }

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image mimes decode for real: band luminance features from the raster") {
    import MultimodalOps._
    // top half black, bottom half white → dim=2 bands [0, 1]; solid
    // mid-gray (128) → both bands 128/255
    val records = Seq(
      MediaRecord(1L, png(8, 8)((_, y) => if (y < 4) 0x000000 else 0xffffff), "image/png"),
      MediaRecord(2L, png(8, 8)((_, _) => 0x808080), "image/png"))
    val out = extractFeatures(spark.createDataset(records), dim = 2)
      .collect().map(f => f.doc_id -> f.feat).toMap
    assert(out(1L)(0) == 0f && out(1L)(1) == 1f)
    assert(out(2L)(0) == 128f / 255f && out(2L)(1) == 128f / 255f)
  }

  test("undecodable image payload fails loudly with the doc_id") {
    import MultimodalOps._
    val bad = spark.createDataset(
      Seq(MediaRecord(42L, Array[Byte](1, 2, 3), "image/png")))
    val e = intercept[org.apache.spark.SparkException](
      extractFeatures(bad, dim = 2).collect())
    assert(e.getMessage.contains("42") ||
      Option(e.getCause).exists(_.getMessage.contains("42")))
  }

  private def wav(samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio/wav decodes real PCM: band RMS energy, silence vs half-scale square") {
    import MultimodalOps._
    // first half silence, second half a +/-16384 square wave: dim=2 RMS
    // bands are exactly [0, 0.5]
    val samples = Array.fill(400)(0.toShort) ++
      Array.tabulate(400)(i => (if (i % 2 == 0) 16384 else -16384).toShort)
    val out = extractFeatures(
      spark.createDataset(Seq(MediaRecord(9L, wav(samples), "audio/wav"))), dim = 2)
      .head()
    assert(out.feat(0) == 0f)
    assert(out.feat(1) == 0.5f)
  }

  test("undecodable audio payload fails loudly with the doc_id") {
    import MultimodalOps._
    val bad = spark.createDataset(
      Seq(MediaRecord(43L, Array[Byte](9, 9, 9, 9), "audio/wav")))
    val e = intercept[org.apache.spark.SparkException](
      extractFeatures(bad, dim = 2).collect())
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(m =>
        m.contains("43") || m.toLowerCase.contains("audio") || m.toLowerCase.contains("stream")) ||
        mentions(t.getCause))
    assert(mentions(e))
  }

  test("non-image mimes keep the oracle-reproducible byte featurizer") {
    import MultimodalOps._
    val payload = "hello media".getBytes("UTF-8")
    val out = extractFeatures(
      spark.createDataset(Seq(MediaRecord(7L, payload, "text/plain"))), dim = 2)
      .head()
    // mean byte value per half, as the DuckDB oracle computes it
    val (a, b) = payload.splitAt(payload.length / 2)
    assert(out.feat(0) == a.map(_ & 0xff).sum.toFloat / a.length / 255f)
    assert(out.feat(1) == b.map(_ & 0xff).sum.toFloat / b.length / 255f)
  }
}
