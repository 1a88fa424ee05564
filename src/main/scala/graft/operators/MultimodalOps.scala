package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.6): image/audio/video payloads are
  * opaque `binary` columns with typed metadata; decode/feature-extraction
  * runs per-partition so a decoder can batch across records.
  *
  * Decode (round 8): REAL for the formats the JVM decodes natively —
  * `image/png`/`jpeg`/`gif`/`bmp` through ImageIO (per-band mean luminance
  * of the decoded raster) and `audio/wav`/`aiff` PCM through
  * javax.sound.sampled (per-band RMS energy of channel 0); undecodable
  * claimed payloads fail LOUDLY with the doc_id, never silently. Mimes
  * with no offline decoder (video, compressed audio) and the corpus's
  * `text/plain` stand-ins keep the deterministic byte-level featurizer,
  * which is also what the DuckDB oracle reproduces. The partition-iterator
  * batching, binary schema, and typed output are the production shape
  * either way: adding another codec extends one mime dispatch.
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

  private val ImageMimes = Set("image/png", "image/jpeg", "image/gif", "image/bmp")
  private val AudioMimes = Set("audio/wav", "audio/x-wav", "audio/aiff", "audio/x-aiff")

  /** Real PCM decode for JVM-native audio containers (WAV/AIFF via
    * javax.sound.sampled): channel-0 samples as doubles in [-1, 1].
    * Compressed codecs (mp3/ogg/flac) have no offline decoder — their
    * mimes are not claimed, so they take the byte-featurizer path.
    */
  private def decodePcm(bytes: Array[Byte], docId: Long): Array[Double] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          (fmt.getSampleSizeInBits == 16 || fmt.getSampleSizeInBits == 8),
        s"unsupported audio encoding ${fmt.getEncoding}/${fmt.getSampleSizeInBits}bit for doc $docId")
      val raw = in.readAllBytes()
      val frame = fmt.getFrameSize
      val n = raw.length / frame
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        val o = i * frame // channel 0 leads each frame
        out(i) =
          if (fmt.getSampleSizeInBits == 16) {
            val s =
              if (fmt.isBigEndian) ((raw(o) << 8) | (raw(o + 1) & 0xff)).toShort
              else ((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort
            s.toDouble / 32768.0
          } else raw(o).toDouble / 128.0
        i += 1
      }
      out
    } finally in.close()
  }

  /** Feature extraction with a per-mime decode dispatch: image mimes decode
    * for REAL via ImageIO and featurize from the raster (dim horizontal
    * bands, mean Rec.601 luminance per band — deterministic integer
    * arithmetic); everything else featurizes the raw bytes. The
    * mapPartitions shape (iterator in, iterator out, one decoder context
    * per partition) is what a native audio/video codec would also batch at.
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
        val feat =
          if (ImageMimes.contains(r.mime)) {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            require(img != null, s"undecodable ${r.mime} payload for doc ${r.doc_id}")
            val (w, hI) = (img.getWidth, img.getHeight)
            Array.tabulate(dim) { d =>
              val y0 = d * hI / dim
              val y1 = math.min(math.max(y0 + 1, (d + 1) * hI / dim), hI)
              var s = 0L
              var n = 0
              var y = y0
              while (y < y1) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  s += (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
                  n += 1
                  x += 1
                }
                y += 1
              }
              s.toFloat / n / 255f
            }
          } else if (AudioMimes.contains(r.mime)) {
            // real PCM decode: per-band RMS energy over dim time bands
            val pcm = decodePcm(bytes, r.doc_id)
            require(pcm.nonEmpty, s"empty audio stream for doc ${r.doc_id}")
            Array.tabulate(dim) { d =>
              val lo = d * pcm.length / dim
              val hi = math.min(math.max(lo + 1, (d + 1) * pcm.length / dim), pcm.length)
              var s = 0.0
              var j = lo
              while (j < hi) { s += pcm(j) * pcm(j); j += 1 }
              math.sqrt(s / (hi - lo)).toFloat
            }
          } else {
            // opaque payload: mean byte value per contiguous chunk
            Array.tabulate(dim) { d =>
              val lo = d * bytes.length / dim
              val hi = math.max(lo + 1, (d + 1) * bytes.length / dim)
              var s = 0L
              var j = lo
              while (j < math.min(hi, bytes.length)) { s += (bytes(j) & 0xff); j += 1 }
              s.toFloat / (hi - lo) / 255f
            }
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
