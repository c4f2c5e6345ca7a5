package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation: the capstone pipeline that
  * composes the LLM-tier operators into the shape a real corpus pass
  * runs — near-dup dedup → per-language stratified downsampling →
  * fixed-window chunking — as ONE lazy Spark plan, and stays fully
  * DuckDB-oracle-checkable (the whole chain is deterministic relational
  * algebra; the only iteration, connected components, is mirrored by a
  * recursive CTE).
  *
  * Stage shuffles at 100 TB: the banded MinHash candidate join + bounded
  * label propagation (Dedup.nearDupClustersBanded — LSH candidates, NOT
  * the quadratic exact-Jaccard pair generation), one map-side sample
  * filter, and the per-row chunk expansion — sampling and chunking add
  * NO shuffle beyond the final output sort.
  */
object TrainingPrep {

  /** QUALITY-GATED training prep — the second capstone, orthogonal to
    * [[prepare]]'s dedup axis: heuristic quality score (lexical shape)
    * AND n-gram LM score (corpus-frequency prior) must BOTH pass before
    * a document is chunked. This is the CCNet/Gopher-style two-signal
    * filter: shape catches degenerate repetition, the LM prior catches
    * fluent-looking noise whose n-grams nothing else shares. One lazy
    * plan: two per-doc score subtrees joined back on doc_id (each one
    * scan + bounded shuffles), chunking map-side. Thresholds sit inside
    * the corpus' score spread so both signals genuinely discriminate. */
  def qualityFilter(documents: DataFrame, minQuality: Double = 0.59,
                    minMeanBf: Double = 30.0): DataFrame = {
    val q = TextAnalysis.qualityScore(documents).select(col("doc_id"), col("quality"))
    val lm = TextAnalysis.lmScore(documents).select(col("doc_id"), col("mean_bf"))
    val survivors = documents
      .join(q, "doc_id")
      .join(lm, "doc_id")
      .filter(col("quality") >= minQuality && col("mean_bf") >= minMeanBf)
    TextAnalysis.chunk(survivors.select(col("doc_id"), col("text")))
      .join(survivors.select(col("doc_id"), col("lang"), col("quality")), "doc_id")
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
        col("n_tokens"), col("lang"), col("quality"))
      .orderBy("doc_id", "chunk_id")
  }

  /** corpus → deduped, rebalanced, chunked training rows
    * (doc_id, chunk_id, chunk_text, n_tokens, lang). */
  def prepare(documents: DataFrame): DataFrame = {
    val corpus = Corpus.docCorpus(documents)
    // 1. near-dup clustering over BANDED MinHash candidates; survivors =
    //    each cluster's canonical doc (exact dups collide in every band,
    //    so this subsumes exact dedup). The banded edge set is the 100 TB
    //    path — exact Jaccard pair generation is quadratic in duplicate
    //    multiplicity and exists only as the oracle baseline.
    val clusters = Dedup.nearDupClustersBanded(corpus)
    val survivors = corpus.join(clusters, "doc_id")
      .filter(col("cluster") === col("doc_id"))
    // 2. rebalance the language mix (same rates as sample_stratified)
    val sampled = survivors.filter(
      when(col("lang") === "en", pmod(col("doc_id"), lit(10)) < 2)
        .otherwise(pmod(col("doc_id"), lit(10)) < 5))
    // 3. fixed-size overlapping token windows, tagged with language
    TextAnalysis.chunk(sampled.select(col("doc_id"), col("text")))
      .join(sampled.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
        col("n_tokens"), col("lang"))
      .orderBy("doc_id", "chunk_id")
  }
}
