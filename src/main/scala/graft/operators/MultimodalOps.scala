package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.6): image/audio/video payloads are
  * opaque `binary` columns with typed metadata; decode/feature-extraction
  * runs per-partition so a real implementation can batch into a native
  * decoder.
  *
  * The decode step is STUBBED — media codecs are unavailable offline — with
  * a deterministic byte-level featurizer. Everything around it (binary
  * schema, metadata struct, partition-iterator batching, typed output
  * schema) is the real production shape: swapping the stub for a JNI/FFI
  * decoder changes one function body.
  */
object MultimodalOps {

  /** A media row: opaque payload + metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features: byte count, content checksum, fixed-dim vector. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long, feat: Array[Float])

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Treat `documents.text` as a binary payload (the corpus has no real
    * media; UTF-8 bytes stand in for an image/audio blob).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"))

  /** STUB decoder: deterministic features from raw bytes.
    *
    * Real path: `it.grouped(batchSize)` → hand each batch of payloads to a
    * native decoder (libjpeg/ffmpeg/...) → emit per-record features. The
    * mapPartitions shape (iterator in, iterator out, no per-row JVM↔native
    * crossing) is what makes that efficient; it is preserved here.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // one digest instance per partition (the batching boundary a native
      // decoder would also live at), reset per record
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val bytes = r.payload
        // content digest: first 60 bits of md5 — the stub's stand-in for
        // "decode succeeded". md5 (vs round 1's FNV-1a) keeps the value
        // reproducible by the DuckDB oracle (PortableHash.hash60 contract)
        // without wraparound arithmetic DuckDB's BIGINT would reject.
        md.reset()
        val hex = md.digest(bytes).map(b => f"$b%02x").mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        // fake "embedding": mean byte value per contiguous chunk
        val feat = Array.tabulate(dim) { d =>
          val lo = d * bytes.length / dim
          val hi = math.max(lo + 1, (d + 1) * bytes.length / dim)
          var s = 0L
          var j = lo
          while (j < math.min(hi, bytes.length)) { s += (bytes(j) & 0xff); j += 1 }
          s.toFloat / (hi - lo) / 255f
        }
        MediaFeatures(r.doc_id, bytes.length, h, feat)
      }
    }

  /** Full pipeline over a documents table: payload → stubbed decode →
    * features DataFrame.
    */
  def mediaFeatures(docs: DataFrame, dim: Int): DataFrame =
    extractFeatures(asMedia(docs).as[MediaRecord], dim).toDF()
}
