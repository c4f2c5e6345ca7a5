package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Dedup-on-ingest: a streaming near-duplicate detector that maintains a
  * persistent MinHash band index and checks every incoming micro-batch
  * against it — the streaming form of `dedup_near_minhash`, and the shape
  * a training-data pipeline runs at the crawl frontier (is this incoming
  * page a near-copy of anything already ingested?).
  *
  * Per micro-batch (one `foreachBatch` job):
  *   1. signatures for the batch in a map-only pass (`minhash_sig` — no
  *      shuffle, see graft.functions.MinHashSig), banded into
  *      (band, band_sig) bucket keys;
  *   2. equi-join batch bands against the persisted index → candidate
  *      near-dups (within-bucket work only, the LSH guarantee);
  *   3. append the batch's bands to the index (write-once, no rewrite).
  *
  * The index is an append-only parquet table of (doc_id, band, band_sig)
  * — at 100 TB it is partitioned/bucketed by (band, band_sig) so step 2
  * prunes to the probed buckets. Batch replay after a crash re-appends
  * the same band rows; candidates are emitted with `distinct`, and an
  * exactly-once sink (or dedup on (a, b)) absorbs the duplicate rows —
  * the candidate SET is unaffected.
  *
  * Matches (earlier doc_id = index side) land in `matchesPath` as
  * (probe_id, index_id) pairs.
  */
object StreamingNearDup {

  val NumHashes = 16
  val RowsPerBand = 4

  /** (doc_id, band, band_sig) band rows for a static batch of documents —
    * the same banding as Dedup.minhashCandidates, map-only. */
  def bandRows(docs: DataFrame): DataFrame = {
    val numBands = NumHashes / RowsPerBand
    docs
      .select(col("doc_id"),
        graft.functions.TextExprs.minhashSig(
          TextOps.shingles(TextOps.tokens(col("text")), 3), NumHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"),
        posexplode(array((0 until numBands).map(bnd =>
          xxhash64((bnd * RowsPerBand until (bnd + 1) * RowsPerBand)
            .map(i => element_at(col("sig"), i + 1)): _*)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_sig")
  }

  /** Streaming writer: maintain the band index at `indexPath`, append
    * candidate matches to `matchesPath`. */
  def indexAndMatch(stream: DataFrame, indexPath: String, matchesPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val bands = bandRows(batch).persist()
      try {
        val idx = new org.apache.hadoop.fs.Path(indexPath)
        val fs = idx.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(idx)) {
          val index = spark.read.parquet(indexPath)
          val matches = bands.as("p")
            .join(index.as("x"),
              col("p.band") === col("x.band") && col("p.band_sig") === col("x.band_sig") &&
                col("p.doc_id") =!= col("x.doc_id"))
            .select(col("p.doc_id").as("probe_id"), col("x.doc_id").as("index_id"))
            .distinct()
          matches.write.mode("append").parquet(matchesPath)
        }
        bands.write.mode("append").parquet(indexPath)
      } finally { bands.unpersist(); () }
    }

  /** Read accumulated matches (empty if none were written yet). */
  def matches(spark: SparkSession, matchesPath: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(matchesPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(matchesPath)) else None
  }
}
