package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING eval-set decontamination — the ingest-time guard form of
  * [[graft.llm.TrainingPrep.decontaminate]]: documents arrive as a
  * stream (a crawl feed), and any doc sharing a word-13-gram with the
  * STATIC eval gram set is flagged before it can enter a training
  * shard. The eval side is computed once from the held-out split
  * ([[graft.llm.TrainingPrep.evalGramSet]]) — small by construction —
  * and rides the stream-static join as a broadcast, so each microbatch
  * is a map-side probe: no stream-side state grows with the corpus,
  * only the emitted-flag dedup keeps (tiny) state.
  *
  * At 100 TB feed scale this is exactly the shape you want: the gram
  * explode is the compiled WordShingles pass per batch, the probe
  * touches only the broadcast hash set, and the one stateful operator
  * (dropDuplicates on doc_id) holds flagged ids — bounded by leakage,
  * not traffic. Gated end-to-end in StreamingSpec against the batch
  * operator's verdicts.
  */
object StreamingDecontam {

  /** Flagged doc_ids from a streaming (doc_id, text) frame probed
    * against the static eval gram set. Append-mode friendly: each
    * contaminated doc_id is emitted exactly once. */
  def flag(stream: DataFrame, evalGrams: DataFrame, k: Int = 13): DataFrame =
    graft.llm.TrainingPrep.docGrams(stream, k)
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .dropDuplicates("doc_id")
      .select("doc_id")
}
