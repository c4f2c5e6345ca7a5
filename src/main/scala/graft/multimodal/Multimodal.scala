package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media item: opaque binary payload + typed metadata. In a real
  * pipeline `content` holds encoded image/audio/video bytes read from
  * parquet/blob storage; here it is derived from document text so the
  * Spark-side plumbing (schema, encoders, partition-batched decode) is
  * real and testable. */
case class MediaItem(doc_id: Long, kind: String, content: Array[Byte])

case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                         feature: Array[Double])

/** Multimodal column handling: binary payloads with typed metadata and a
  * partition-batched decode/feature-extract stage.
  *
  * The video decode branch is STUBBED (this container has no codecs):
  * it computes a deterministic fake feature vector from the bytes. The
  * AUDIO and IMAGE branches are REAL decodes of codec-free container
  * formats: audio payloads are canonical RIFF/WAVE 16-bit PCM parsed by
  * [[decodeWav]] (chunk walk → sample decode → per-window RMS energy),
  * image payloads are binary P6 PPM parsed by [[decodePpm]] (header
  * parse → RGB pixel decode → per-block mean intensity). Everything
  * around the branches — the binary column schema, the typed Dataset
  * boundary, the fixed-size batching inside `mapPartitions` (the shape
  * a JNI/FFI or model-server call needs to amortize per-batch setup) —
  * is the real production plumbing.
  */
object Multimodal {

  /** Batch size for the decode call. Real decoders (codec contexts, GPU
    * feature extractors) are called once per batch, not per row. */
  val DecodeBatch = 64

  /** Binary-column metadata extraction — pure codegen'd expressions over
    * the binary payload (length, digest, hex prefix), no decode needed.
    * This is the "cheap metadata pass" a pipeline runs before deciding
    * what to actually decode. */
  def binaryMeta(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      md5(col("text").cast("binary")).as("digest"),
      lower(hex(substring(col("text"), 1, 8).cast("binary"))).as("prefix_hex"))
      .orderBy("doc_id")

  /** documents → typed media items. Video payloads are raw text bytes
    * standing in for encoded media; AUDIO payloads are genuine WAV files
    * ([[synthWav]]) and IMAGE payloads genuine binary PPMs ([[synthPpm]]),
    * both deterministically derived from the text, so those two decode
    * branches exercise real parsers end-to-end (note: an audio/image
    * item's n_bytes in [[decodeSummary]] is the CONTAINER size — 44+2n
    * for WAV, header+3n for PPM — not the source text length that
    * [[binaryMeta]] reports). */
  def asMediaItems(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    binaryMeta(documents)
      .join(documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("kind"),
        col("text").cast("binary").as("content"))
      .as[MediaItem]
      .map(m => m.kind match {
        case "audio" => m.copy(content = synthWav(m.content))
        case "image" => m.copy(content = synthPpm(m.content))
        case _ => m
      })
  }

  /** Partition-batched decode + feature extraction. Stays fully
    * distributed: each partition groups its rows into DecodeBatch-sized
    * batches and "decodes" each batch in one call. */
  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap(decodeBatch)
    }
  }

  /** One decode call per batch — the FFI/model-server boundary. */
  private def decodeBatch(batch: Seq[MediaItem]): Seq[MediaFeatures] =
    batch.map(stubDecode)

  /** Per-kind decode dispatch — the shape of a multimodal feature pass
    * (each branch is where a codec/FFI call goes):
    *  - image → REAL PPM parse ([[decodePpm]]): mean intensity per 8
    *    pixel blocks of the decoded RGB raster,
    *  - audio → REAL WAV parse ([[decodeWav]]): RMS energy per 8 windows
    *    of the decoded 16-bit PCM samples,
    *  - video → STUB "keyframe-sample": rolling hash per 8 segments. */
  private def stubDecode(m: MediaItem): MediaFeatures = {
    val bytes = m.content
    val n = math.max(bytes.length, 1)
    def blockFold(i: Int, mix: (Long, Int) => Long): Double = {
      val lo = i * n / 8
      val hi = math.max(lo + 1, (i + 1) * n / 8)
      var acc = 0L
      var j = lo
      while (j < hi && j < bytes.length) { acc = mix(acc, bytes(j) & 0xff); j += 1 }
      (acc % 1000003L).toDouble / 1000003.0
    }
    val feat = m.kind match {
      case "image" => decodePpm(bytes)                                           // REAL decode
      case "audio" => decodeWav(bytes)                                           // REAL decode
      case _       => Array.tabulate(8)(blockFold(_, (a, b) => a * 31 + b))       // keyframe hash
    }
    MediaFeatures(m.doc_id, m.kind, bytes.length, feat)
  }

  /** Synthesize a canonical 16-bit mono PCM WAV (44-byte RIFF header +
    * data chunk): sample i = (srcByte_i − 128) · 256, i.e. the source
    * bytes centered and scaled to 16-bit range. Deterministic — this is
    * the harness stand-in for real recorded audio. */
  private[graft] def synthWav(src: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val nSamples = math.max(src.length, 1)
    val bb = java.nio.ByteBuffer.allocate(44 + nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                    // audio format: PCM
    bb.putShort(1)                    // channels: mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)         // byte rate
    bb.putShort(2)                    // block align
    bb.putShort(16)                   // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val b = if (src.isEmpty) 128 else src(i % src.length) & 0xff
      bb.putShort(((b - 128) * 256).toShort)
      i += 1
    }
    bb.array()
  }

  /** Synthesize a binary P6 PPM (16-pixel-wide grayscale-as-RGB raster):
    * pixel i's channels are all srcByte_i (wrapping). Deterministic —
    * the harness stand-in for real encoded images. */
  private[graft] def synthPpm(src: Array[Byte], width: Int = 16): Array[Byte] = {
    val n = math.max(src.length, 1)
    val height = (n + width - 1) / width
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < width * height) {
      val b: Byte = if (src.isEmpty) 0 else src(i % src.length)
      val off = header.length + i * 3
      out(off) = b; out(off + 1) = b; out(off + 2) = b
      i += 1
    }
    out
  }

  /** REAL image decode: parse the P6 PPM header (magic, whitespace- and
    * comment-tolerant width/height/maxval per spec), decode the RGB
    * raster, and return mean intensity (average channel / maxval) over 8
    * equal pixel blocks — an actual end-to-end decode with zero codec
    * dependency (binary PPM is a pure container format). */
  private[graft] def decodePpm(bytes: Array[Byte]): Array[Double] = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a binary P6 PPM")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and #-comments
      while (pos < bytes.length &&
        (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      var v = 0
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      require(pos > start, s"malformed PPM header at byte $pos")
      v
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    require(width > 0 && height > 0 && maxval > 0 && maxval < 65536,
      s"invalid PPM dimensions ${width}x$height maxval $maxval")
    require(maxval < 256, "16-bit-per-channel PPM not supported")
    pos += 1 // single whitespace after maxval, then raster
    val nPix = math.min(width * height, (bytes.length - pos) / 3)
    require(nPix > 0, "PPM has no raster data")
    Array.tabulate(8) { blk =>
      val lo = blk * nPix / 8
      val hi = math.max(lo + 1, (blk + 1) * nPix / 8)
      var acc = 0.0
      var i = lo
      while (i < hi && i < nPix) {
        val off = pos + i * 3
        acc += ((bytes(off) & 0xff) + (bytes(off + 1) & 0xff) + (bytes(off + 2) & 0xff)) / 3.0
        i += 1
      }
      acc / (hi - lo) / maxval
    }
  }

  /** REAL audio decode: walk the RIFF chunk list (fmt + data, tolerating
    * other chunks and odd-length padding per spec), require 16-bit mono
    * PCM, decode the little-endian samples to [-1, 1), and return RMS
    * energy over 8 equal windows — an actual end-to-end decode with zero
    * codec dependency (WAV PCM is a pure container format). */
  private[graft] def decodeWav(bytes: Array[Byte]): Array[Double] = {
    require(bytes.length >= 12, "truncated WAV: no RIFF header")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE",
      s"not a RIFF/WAVE file: ${tag(0)}/${tag(8)}")
    var pos = 12
    var dataOff = -1
    var dataLen = 0
    var bits = -1
    var channels = -1
    while (pos + 8 <= bytes.length && (dataOff < 0 || bits < 0)) {
      val id = tag(pos)
      val len = bb.getInt(pos + 4)
      // malformed length guard: a negative len would stall the walk (the
      // advance becomes 0), an oversized one overflows pos — both must be
      // a parse error, not a hang/JVM exception
      require(len >= 0 && len <= bytes.length - (pos + 8),
        s"malformed WAV chunk '$id': length $len at offset $pos exceeds payload")
      id match {
        case "fmt " =>
          require(len >= 16, s"truncated fmt chunk: $len bytes")
          val fmt = bb.getShort(pos + 8)
          require(fmt == 1, s"unsupported WAV encoding $fmt (want PCM)")
          channels = bb.getShort(pos + 10)
          bits = bb.getShort(pos + 22)
        case "data" =>
          dataOff = pos + 8
          dataLen = len
        case _ => () // skip LIST/INFO/etc.
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(dataOff >= 0, "WAV has no data chunk")
    require(bits == 16 && channels == 1,
      s"expected 16-bit mono PCM, got $bits-bit $channels-channel")
    val nSamples = dataLen / 2
    Array.tabulate(8) { w =>
      val lo = w * nSamples / 8
      val hi = math.max(lo + 1, (w + 1) * nSamples / 8)
      var acc = 0.0
      var j = lo
      while (j < hi && j < nSamples) {
        val s = bb.getShort(dataOff + j * 2) / 32768.0
        acc += s * s
        j += 1
      }
      math.sqrt(acc / (hi - lo))
    }
  }

  /** Feature summary as a DataFrame query (rows-only checked by the
    * driver — the stub features are not SQL-expressible). */
  def decodeSummary(documents: DataFrame)(implicit spark: SparkSession): DataFrame =
    decodeFeatures(asMediaItems(documents)).toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        round(element_at(col("feature"), 1), 6).as("f0"))
      .orderBy("doc_id")
}
