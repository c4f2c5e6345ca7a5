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
  * The decode itself is STUBBED (this container has no image/audio
  * codecs): `stubDecode` computes a deterministic fake feature vector from
  * the bytes. Everything around it — the binary column schema, the typed
  * Dataset boundary, the fixed-size batching inside `mapPartitions` (the
  * shape a JNI/FFI or model-server call needs to amortize per-batch
  * setup) — is the real production plumbing.
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

  /** documents → typed media items (text bytes standing in for encoded
    * media). */
  def asMediaItems(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    binaryMeta(documents)
      .join(documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("kind"),
        col("text").cast("binary").as("content"))
      .as[MediaItem]
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

  /** STUB decode with per-kind dispatch — the real shape of a multimodal
    * feature pass (each branch is where a codec/FFI call goes; no codecs
    * in this container, so each computes a deterministic stand-in of the
    * same output shape):
    *  - image → "resize": 8 coarse intensity cells over byte blocks,
    *  - audio → "frame-sample": energy per 8 fixed-stride windows,
    *  - video → "keyframe-sample": rolling hash per 8 equal segments. */
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
      case "image" => Array.tabulate(8)(blockFold(_, (a, b) => a + b))          // cell mean-ish
      case "audio" => Array.tabulate(8)(blockFold(_, (a, b) => a + b.toLong * b)) // energy
      case _       => Array.tabulate(8)(blockFold(_, (a, b) => a * 31 + b))       // keyframe hash
    }
    MediaFeatures(m.doc_id, m.kind, bytes.length, feat)
  }

  /** Feature summary as a DataFrame query (rows-only checked by the
    * driver — the stub features are not SQL-expressible). */
  def decodeSummary(documents: DataFrame)(implicit spark: SparkSession): DataFrame =
    decodeFeatures(asMediaItems(documents)).toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        round(element_at(col("feature"), 1), 6).as("f0"))
      .orderBy("doc_id")
}
