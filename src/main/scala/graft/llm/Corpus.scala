package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic dedup fixtures: the driver's `documents`/`embeddings`
  * tables contain no duplicates (verified at sf0.01), so the dedup corpora
  * inject exact and near duplicates with key-derived, oracle-mirrored
  * derivations — same pattern as the sync-diff snapshots
  * (graft.sync.Snapshots).
  */
object Corpus {

  /** documents ∪ exact copies (doc_id ≡ 0 mod 7, +100000) ∪ near copies
    * with a 3-token tail appended (doc_id ≡ 5 mod 10, +200000). */
  def docCorpus(documents: DataFrame): DataFrame = {
    val exact = documents.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
    val near = documents.filter(col("doc_id") % 10 === 5)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("text", concat(col("text"), lit(" near dup tail")))
    documents.unionByName(exact).unionByName(near)
  }

  val docCorpusSql: String =
    """SELECT doc_id, text, lang, source, n_chars FROM documents
      |UNION ALL SELECT doc_id+100000, text, lang, source, n_chars FROM documents WHERE doc_id % 7 = 0
      |UNION ALL SELECT doc_id+200000, text || ' near dup tail', lang, source, n_chars
      | FROM documents WHERE doc_id % 10 = 5""".stripMargin

  /** embeddings widened to double ∪ slightly perturbed near-dup vectors
    * (vec_id ≡ 0 mod 10, +100000; x → x*1.01 + 0.001 in double, so the
    * perturbation is IEEE-identical in both engines). */
  def vecCorpus(embeddings: DataFrame): DataFrame = {
    // native array cast (codegen'd): the interpreted per-element HOF cast
    // was the dominant cost of every consumer of this corpus
    val v = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    // the perturbation HOF only runs over the 10% near-dup subset
    val near = v.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("v"), x => x * lit(1.01) + lit(0.001)).as("v"))
    v.unionByName(near)
  }

  val vecCorpusSql: String =
    """SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      |UNION ALL SELECT vec_id+100000, list_transform(embedding, x -> CAST(x AS DOUBLE)*1.01 + 0.001)
      | FROM embeddings WHERE vec_id % 10 = 0""".stripMargin
}
