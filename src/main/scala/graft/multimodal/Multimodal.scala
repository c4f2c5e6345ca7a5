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
  * ALL THREE decode branches are REAL decodes of codec-free container
  * formats (this container has no codecs, so the formats are chosen to
  * be parseable in pure JVM): audio payloads are canonical RIFF/WAVE
  * 16-bit PCM parsed by [[decodeWav]] (chunk walk → sample decode →
  * per-window RMS energy), image payloads are binary P6 PPM parsed by
  * [[decodePpm]] (header parse → RGB pixel decode → per-block mean
  * intensity), and video payloads are YUV4MPEG2 (y4m) streams parsed by
  * [[decodeY4m]] (stream-header parse → per-frame raw-plane walk →
  * per-frame mean luma). Everything around the branches — the binary
  * column schema, the typed Dataset boundary, the fixed-size batching
  * inside `mapPartitions` (the shape a JNI/FFI or model-server call
  * needs to amortize per-batch setup) — is the real production
  * plumbing.
  */
object Multimodal {

  /** Batch size for the decode call. Real decoders (codec contexts, GPU
    * feature extractors) are called once per batch, not per row. */
  val DecodeBatch = 64

  /** Mean of `value(i)` over `nBlocks` equal index blocks of [0, n) —
    * the shared aggregation skeleton of all three decoders (PPM pixel
    * blocks, WAV sample windows, y4m frame blocks) and of the 64-block
    * perceptual hash. Block bounds computed in Long so blk·n cannot
    * overflow for large rasters. */
  private def blockMeans(n: Int, nBlocks: Int = 8)(value: Int => Double): Array[Double] =
    Array.tabulate(nBlocks) { blk =>
      val lo = (blk.toLong * n / nBlocks).toInt
      val hi = math.max(lo + 1, ((blk + 1).toLong * n / nBlocks).toInt)
      var acc = 0.0
      var i = lo
      while (i < hi && i < n) { acc += value(i); i += 1 }
      acc / (hi - lo)
    }

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

  /** documents → typed media items. AUDIO payloads are genuine WAV
    * files ([[synthWav]]), IMAGE payloads genuine binary PPMs
    * ([[synthPpm]]), and VIDEO payloads genuine y4m streams
    * ([[synthY4m]]), all deterministically derived from the text, so all
    * three decode branches exercise real parsers end-to-end (note: an
    * item's n_bytes in [[decodeSummary]] is the CONTAINER size — 44+2n
    * for WAV, header+3n for PPM, header+frames·(6+3wh) for y4m — not
    * the source text length that [[binaryMeta]] reports). */
  def asMediaItems(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    binaryMeta(documents)
      .join(documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("kind"),
        // null text → empty payload (the synths emit their minimal
        // 1-sample container), not an NPE in the decode batch — a crawl
        // row with a missing blob must not kill the whole media pass
        coalesce(col("text").cast("binary"), lit(Array.empty[Byte])).as("content"))
      .as[MediaItem]
      .map(m => m.kind match {
        case "audio" => m.copy(content = synthWav(m.content))
        case "image" => m.copy(content = synthPpm(m.content))
        case _ => m.copy(content = synthY4m(m.content))
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
    *  - video → REAL y4m parse ([[decodeY4m]]): mean luma per 8 frame
    *    blocks of the decoded frame sequence. */
  private def stubDecode(m: MediaItem): MediaFeatures = {
    val bytes = m.content
    val feat = m.kind match {
      case "image" => decodePpm(bytes)
      case "audio" => decodeWav(bytes)
      case _       => decodeY4m(bytes)
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

  /** Synthesize a YUV4MPEG2 (y4m) stream — the codec-free video
    * container (plain ASCII stream header + per-frame "FRAME\n" marker +
    * raw planes): `frames` frames of `width`×`height` C444 YUV, where
    * frame f's luma pixel i is srcByte_{f·wh+i} (wrapping) and both
    * chroma planes are the neutral 128. Deterministic — the harness
    * stand-in for real encoded video. */
  private[graft] def synthY4m(src: Array[Byte], width: Int = 8, height: Int = 8,
                              frames: Int = 8): Array[Byte] = {
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val wh = width * height
    val out = java.nio.ByteBuffer.allocate(header.length + frames * (marker.length + 3 * wh))
    out.put(header)
    val n = math.max(src.length, 1)
    var f = 0
    while (f < frames) {
      out.put(marker)
      var i = 0
      while (i < wh) { // luma plane from the source bytes
        out.put(if (src.isEmpty) 0.toByte else src((f * wh + i) % n))
        i += 1
      }
      i = 0
      while (i < 2 * wh) { out.put(128.toByte); i += 1 } // neutral U, V
      f += 1
    }
    out.array()
  }

  /** REAL video decode: parse the YUV4MPEG2 stream header (W/H required;
    * F/I/A/X parameters tolerated; C colorspace resolved to a per-frame
    * chroma size — C444, C422, C420 variants and Cmono), walk the FRAME
    * markers (per-frame parameters tolerated), decode each raw luma
    * plane, and return mean luma (0–1) over 8 equal frame blocks — an
    * actual end-to-end decode with zero codec dependency (y4m is a pure
    * container format: no entropy coding, no inter-frame prediction). */
  private[graft] def decodeY4m(bytes: Array[Byte]): Array[Double] = {
    val frameMeans = y4mFrameMeans(bytes)
    // 8 equal blocks over the frame sequence (same aggregation shape as
    // the PPM pixel blocks / WAV sample windows)
    blockMeans(frameMeans.length)(frameMeans)
  }

  /** The y4m stream walk underlying [[decodeY4m]] and [[frameSample]]:
    * header parse → FRAME-marker walk → one mean luma (0–1) per decoded
    * frame, in stream order. */
  private[graft] def y4mFrameMeans(bytes: Array[Byte]): Array[Double] = {
    val magic = "YUV4MPEG2"
    require(bytes.length > magic.length &&
      new String(bytes, 0, magic.length, "US-ASCII") == magic, "not a YUV4MPEG2 stream")
    var pos = magic.length
    def lineEnd(from: Int): Int = {
      var e = from
      while (e < bytes.length && bytes(e) != '\n') e += 1
      require(e < bytes.length, "unterminated y4m header line")
      e
    }
    val hEnd = lineEnd(pos)
    var width = -1
    var height = -1
    var colorspace = "C420jpeg" // the y4m default when no C tag is present
    new String(bytes, pos, hEnd - pos, "US-ASCII").trim.split(' ').filter(_.nonEmpty)
      .foreach { tag =>
        tag.charAt(0) match {
          case 'W' => width = tag.drop(1).toInt
          case 'H' => height = tag.drop(1).toInt
          case 'C' => colorspace = tag
          case _ => () // F frame rate, I interlacing, A aspect, X comment
        }
      }
    require(width > 0 && height > 0, s"invalid y4m dimensions ${width}x$height")
    val wh = width * height
    // exact known 8-bit colorspaces only: a prefix match would walk
    // high-bit-depth streams (C420p10 etc., 2 bytes/sample) with 8-bit
    // strides and produce garbage instead of a clean rejection. Chroma
    // planes of subsampled modes are ceil(w/2)·[h or ceil(h/2)] — plain
    // wh/2 undercounts when a dimension is odd and desyncs the walk.
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    val chromaBytes = colorspace match {
      case "Cmono" => 0
      case "C444" => 2 * wh
      case "C422" => 2 * cw * height
      case "C420" | "C420jpeg" | "C420paldv" | "C420mpeg2" => 2 * cw * ch
      case c => throw new IllegalArgumentException(s"unsupported y4m colorspace $c")
    }
    pos = hEnd + 1
    val frameMeans = scala.collection.mutable.ArrayBuffer.empty[Double]
    while (pos < bytes.length) {
      require(pos + 5 <= bytes.length &&
        new String(bytes, pos, 5, "US-ASCII") == "FRAME", s"missing FRAME marker at byte $pos")
      pos = lineEnd(pos) + 1 // per-frame parameters (rare) end at newline
      require(pos + wh + chromaBytes <= bytes.length, s"truncated y4m frame at byte $pos")
      var acc = 0L
      var i = 0
      while (i < wh) { acc += bytes(pos + i) & 0xff; i += 1 }
      frameMeans += acc.toDouble / wh / 255.0
      pos += wh + chromaBytes
    }
    require(frameMeans.nonEmpty, "y4m has no frames")
    frameMeans.toArray
  }

  /** P6 PPM parse (magic, whitespace- and comment-tolerant
    * width/height/maxval per spec) exposing the decoded raster as
    * (pixel count, maxval, pixel index → mean RGB intensity) — the
    * shared front half of [[decodePpm]] and [[phash64]], an actual
    * end-to-end decode with zero codec dependency (binary PPM is a
    * pure container format). */
  private[graft] def ppmRaster(bytes: Array[Byte]): (Int, Int, Int => Double) = {
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
    val rasterStart = pos
    (nPix, maxval, i => {
      val off = rasterStart + i * 3
      ((bytes(off) & 0xff) + (bytes(off + 1) & 0xff) + (bytes(off + 2) & 0xff)) / 3.0
    })
  }

  /** REAL image decode (see [[ppmRaster]] for the parse): mean intensity
    * per 8 pixel blocks of the decoded RGB raster, normalized by the
    * declared maxval. */
  private[graft] def decodePpm(bytes: Array[Byte]): Array[Double] = {
    val (nPix, maxval, at) = ppmRaster(bytes)
    blockMeans(nPix)(at).map(_ / maxval)
  }

  /** 64-bit average-hash (aHash) of a P6 PPM: mean intensity over 64
    * equal pixel-index blocks of the decoded raster, bit i set iff
    * block i is brighter than the mean of the 64 block means. The
    * classic perceptual fingerprint — near-identical images land within
    * a few Hamming bits, unrelated ones around 32. Pure deterministic
    * JVM arithmetic (engine-internal; never crosses to the oracle). */
  private[graft] def phash64(ppm: Array[Byte]): Long = {
    val (nPix, _, at) = ppmRaster(ppm)
    val means = blockMeans(nPix, 64)(at)
    val gm = means.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (means(i) > gm) bits |= 1L << i; i += 1 }
    bits
  }

  /** REAL audio decode: walk the RIFF chunk list (fmt + data, tolerating
    * other chunks and odd-length padding per spec), require 16-bit mono
    * PCM, decode the little-endian samples to [-1, 1), and return RMS
    * energy over 8 equal windows — an actual end-to-end decode with zero
    * codec dependency (WAV PCM is a pure container format). */
  private[graft] def decodeWav(bytes: Array[Byte]): Array[Double] = {
    val (nSamples, at) = wavSamples(bytes)
    blockMeans(nSamples)(j => at(j) * at(j)).map(math.sqrt)
  }

  /** The RIFF chunk walk underlying [[decodeWav]] and [[audioWindows]]:
    * header validation → fmt/data chunk discovery → (sample count,
    * index → sample in [-1, 1)) accessor over the decoded 16-bit mono
    * PCM. */
  private[graft] def wavSamples(bytes: Array[Byte]): (Int, Int => Double) = {
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
    val dOff = dataOff
    (dataLen / 2, j => bb.getShort(dOff + j * 2) / 32768.0)
  }

  /** Feature summary as a DataFrame query (rows-only checked by the
    * driver — the stub features are not SQL-expressible). */
  def decodeSummary(documents: DataFrame)(implicit spark: SparkSession): DataFrame =
    decodeFeatures(asMediaItems(documents)).toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        round(element_at(col("feature"), 1), 6).as("f0"))
      .orderBy("doc_id")

  /** Deterministic FRAME SAMPLING over the video payloads — the
    * "explode a video into k training frames" pass of a multimodal
    * pipeline (uniform-stride selection is what production samplers
    * default to; a model-driven saliency sampler would slot into the
    * same batch boundary). Frame f_i = floor(i·nf/k) for i in [0, k)
    * over the decoded frame count nf (deduplicated when nf < k — short
    * clips yield fewer rows, never repeats), each emitted as its own
    * row with the decoded per-frame mean luma as the stand-in frame
    * feature. One input row fans out to ≤ k output rows inside the
    * same partition — no shuffle until the presentation sort; at scale
    * the sampler is a pure map stage whose output feeds the embedding
    * batcher. Decode-derived → oracle-exempt; LlmOpsSpec pins the
    * sampled indices and the per-frame values against the y4m
    * synthesis law (frame f's luma = mean of srcBytes[f·wh+i mod n]). */
  def frameSample(documents: DataFrame, k: Int = 4)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    asMediaItems(documents)
      .filter(_.kind == "video")
      .mapPartitions { it =>
        it.grouped(DecodeBatch).flatMap { batch => // one decode call per batch
          batch.flatMap { m =>
            val frames = y4mFrameMeans(m.content)
            val nf = frames.length
            val take = math.min(k, nf)
            (0 until take).map(i => (i.toLong * nf / take).toInt).distinct
              .map(fi => (m.doc_id, fi, nf, frames(fi)))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_frames", "mean_luma")
      .withColumn("mean_luma", round(col("mean_luma"), 6))
      .orderBy("doc_id", "frame_idx")
  }

  /** SCENE-CUT DETECTION (r8) — the shot-boundary pass a video
    * curation pipeline runs before per-scene sampling/captioning:
    * walk EVERY decoded frame (frameSample takes k of them; a cut can
    * hide between any two), score each adjacent pair by |Δ mean luma|
    * (the classic cheap boundary feature — a real pipeline adds
    * histogram/edge deltas, consumed through this same row shape),
    * flag a cut where the delta clears `threshold`. Frame 0 has no
    * predecessor: delta and flag stay null. Same fan-out contract as
    * the sampler: one input row → n_frames rows inside the partition,
    * no shuffle before the presentation sort, one decode call per
    * 64-row batch. Decode-derived → oracle-exempt; LlmOpsSpec replays
    * deltas and flags from the y4m synthesis law and pins both flag
    * classes present. */
  def sceneCuts(documents: DataFrame, threshold: Double = 0.01)
               (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    asMediaItems(documents)
      .filter(_.kind == "video")
      .mapPartitions { it =>
        it.grouped(DecodeBatch).flatMap { batch => // one decode call per batch
          batch.flatMap { m =>
            val frames = y4mFrameMeans(m.content)
            frames.indices.map { i =>
              val delta = if (i == 0) None else Some(math.abs(frames(i) - frames(i - 1)))
              (m.doc_id, i, frames.length, frames(i), delta,
                delta.map(d => if (d > threshold) 1 else 0))
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_frames", "mean_luma", "delta", "is_cut")
      .withColumn("mean_luma", round(col("mean_luma"), 6))
      .withColumn("delta", round(col("delta"), 6))
      .orderBy("doc_id", "frame_idx")
  }

  /** Windowed AUDIO SEGMENTATION over the decoded PCM — the
    * "voice-activity / energy segmentation" pass of an audio pipeline:
    * the stream splits into `nWin` equal windows, each emitted as its
    * own row with RMS energy and zero-crossing rate (the two classic
    * cheap VAD features; a learned VAD model would consume the same
    * window rows). ZCR = fraction of adjacent-sample sign flips inside
    * the window (boundary pairs belong to the window of their SECOND
    * sample, so every adjacent pair is counted exactly once across
    * windows). Same fan-out contract as [[frameSample]]: one input row
    * → nWin rows inside the partition, no shuffle until the
    * presentation sort. Decode-derived → oracle-exempt; LlmOpsSpec
    * recomputes both features from the synthesis law (sample_j =
    * (srcByte_j − 128)·256 / 32768). */
  def audioWindows(documents: DataFrame, nWin: Int = 8)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    asMediaItems(documents)
      .filter(_.kind == "audio")
      .mapPartitions { it =>
        it.grouped(DecodeBatch).flatMap { batch => // one decode call per batch
          batch.flatMap { m =>
            val (n, at) = wavSamples(m.content)
            // clamp like frameSample: a clip shorter than nWin yields
            // one window per sample, never overlapping windows (which
            // would double-count boundary pairs)
            val nw = math.min(nWin, n)
            (0 until nw).map { w =>
              val lo = (w.toLong * n / nw).toInt
              val hi = math.max(lo + 1, ((w + 1).toLong * n / nw).toInt)
              var sq = 0.0
              var flips = 0
              var pairs = 0
              var j = lo
              while (j < hi && j < n) {
                val s = at(j)
                sq += s * s
                if (j > 0) { // pair (j-1, j) counted in j's window
                  if (at(j - 1) * s < 0) flips += 1
                  pairs += 1
                }
                j += 1
              }
              val cnt = math.max(j - lo, 1)
              (m.doc_id, w, n, math.sqrt(sq / cnt),
                if (pairs == 0) 0.0 else flips.toDouble / pairs)
            }
          }
        }
      }
      .toDF("doc_id", "win_idx", "n_samples", "rms", "zcr")
      .withColumn("rms", round(col("rms"), 6))
      .withColumn("zcr", round(col("zcr"), 6))
      .orderBy("doc_id", "win_idx")
  }

  /** Perceptual-hash image dedup: the image slice of the corpus (plus
    * injected exact copies, doc_id%21→+100000, and near copies with the
    * first 8 characters overwritten — a LENGTH-PRESERVING perturbation:
    * appending would shift every aHash block boundary and randomize the
    * hash, doc_id%15→+200000) is decoded to a 64-bit aHash per row
    * (synthesize+hash is one pure JVM call — nothing to batch-amortize,
    * unlike [[decodeFeatures]]' FFI-shaped boundary), then paired by
    * banded Hamming-LSH: the hash splits into maxHamming+1 bit bands,
    * and by pigeonhole two hashes within maxHamming MUST agree on at
    * least one whole band, so the band equi-join loses no qualifying
    * pair; candidates verify map-side via bit_count(xor). Scale: the
    * exchange carries (band, bits, id) rows — 9 small rows per image,
    * never pixels; at 100 TB band width is the recall/cost dial exactly
    * as in the MinHash banding. Oracle-exempt (the decode is not
    * SQL-expressible); exactness gated in LlmOpsSpec. */
  def imagePhashPairs(documents: DataFrame, maxHamming: Int = 8)
                     (implicit spark: SparkSession): DataFrame = {
    // >= 64 would mint zero-width bands (every row in one bucket — a
    // full cross join); negative would explode zero bands (empty result)
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    import spark.implicits._
    val images = documents.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val exact = images.filter(col("doc_id") % 21 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
    // the overwrite must preserve BYTE length (the hash runs over UTF-8
    // bytes and block bounds are index-derived): only docs whose first 8
    // chars are 8 bytes (ASCII prefix) and that extend past them get a
    // near copy — a multibyte or short doc would silently randomize
    val near = images.filter(col("doc_id") % 15 === 0 &&
        length(col("text")) >= 9 &&
        length(substring(col("text"), 1, 8).cast("binary")) === 8)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("text",
        concat(lit("XXXXXXXX"), substring(col("text"), 9, Int.MaxValue)))
    val hashes = images.unionByName(exact).unionByName(near)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val src = Option(t).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (id, phash64(synthPpm(src)))
      })
      .toDF("doc_id", "phash")
    val nb = maxHamming + 1
    val bandExprs = (0 until nb).map { i =>
      val lo = i * 64 / nb
      val width = (i + 1) * 64 / nb - lo
      val mask = if (width == 64) -1L else (1L << width) - 1
      struct(lit(i).as("band"),
        shiftrightunsigned(col("phash"), lo).bitwiseAND(lit(mask)).as("bits"))
    }
    val bands = hashes
      .select(col("doc_id"), col("phash"), explode(array(bandExprs: _*)).as("b"))
      .select(col("doc_id"), col("phash"), col("b.band"), col("b.bits"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.phash").as("ha"), col("y.phash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }
}
