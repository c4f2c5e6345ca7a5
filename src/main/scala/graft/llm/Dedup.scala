package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale notes (100 TB): exact dedup is one hash shuffle on the dedup key;
  * MinHash banding turns O(n²) candidate generation into an equi-join on
  * (band, band-hash) — the only all-pairs work left is within buckets;
  * frequent-shingle pruning (df cap) bounds the Jaccard self-join blowup;
  * the cosine variant only makes sense after an LSH/IVF bucketing
  * (see Similarity.lshTopK) — the all-pairs form here is the correctness
  * baseline on the bounded corpus.
  */
object Dedup {

  /** Exact dedup with a DETERMINISTIC survivor (min doc_id per text) —
    * `dropDuplicates` keeps an arbitrary row, so it can't hash-match an
    * oracle (SURVEY §7). One shuffle on the text hash. */
  def exact(corpus: DataFrame): DataFrame = {
    val byText = Window.partitionBy("text")
    corpus
      .withColumn("rn", row_number().over(byText.orderBy("doc_id")))
      .withColumn("n_copies", count(lit(1)).over(byText))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_copies"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Word-3-gram Jaccard near-dup pairs (threshold 0.5). Exact set
    * semantics — no hashing — so it IS oracle-expressible. The self-join
    * key is the shingle; at scale, cap shingle document-frequency first
    * (a shingle in >df_max docs is boilerplate and only creates
    * candidate-pair noise). */
  def ngramJaccard(corpus: DataFrame, threshold: Double = 0.5): DataFrame = {
    val withSh = corpus
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("shs"))
      .withColumn("n_sh", size(col("shs")))
    val ex = withSh.select(col("doc_id"), col("n_sh"), explode(col("shs")).as("sh"))
    val a = ex.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"), col("sh"))
    val b = ex.select(col("doc_id").as("b_id"), col("n_sh").as("b_n"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** MinHash signatures: h_i(doc) = min over shingles of
    * xxhash64(i ‖ shingle); LSH bands of `rowsPerBand` hashes; candidate
    * pairs = docs sharing any (band, band-signature) bucket. Seeded,
    * reproducible (xxhash64 with fixed per-row seeds — no randomness).
    * Hash-derived → oracle-exempt; gated by DedupSpec invariants
    * (candidates ⊇ exact+near dup pairs, no false self-pairs). */
  def minhashCandidates(corpus: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sig = corpus
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("shs"))
      .withColumn("sig", transform(sequence(lit(0), lit(numHashes - 1)), i =>
        array_min(transform(col("shs"), s => xxhash64(i, s)))))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until numBands).map(bnd =>
        xxhash64(slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_sig")
    val l = banded.select(col("doc_id").as("a_id"), col("band"), col("band_sig"))
    val r = banded.select(col("doc_id").as("b_id"), col("band"), col("band_sig"))
    l.join(r, Seq("band", "band_sig"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
      .orderBy("a_id", "b_id")
  }

  /** 48-bit SimHash fingerprint per document: bit b of the fingerprint is
    * set iff Σ_tokens sign(bit b of xxhash64(token)) > 0. Computed wholly
    * inside HOFs — one pass, no shuffle beyond the final sort. Near-dup
    * docs differ in few bits (Hamming distance gated in DedupSpec). */
  def simhash(corpus: DataFrame, bits: Int = 48): DataFrame = {
    // hash each token once, then fold the ±1 bit votes per fingerprint bit
    val fp = (0 until bits).map { b =>
      when(
        aggregate(col("hs"), lit(0L), (s, h) =>
          s + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    corpus
      .withColumn("hs", transform(TextOps.tokens(col("text")), t => xxhash64(t)))
      .select(col("doc_id"), fp.as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup pairs over the perturbed vector corpus
    * (cosine ≥ 0.99 rounded to 4dp). All-pairs on the bounded corpus —
    * the scale path is LSH bucketing first. */
  def embeddingCosine(vecCorpus: DataFrame, threshold: Double = 0.99): DataFrame = {
    val a = vecCorpus.select(col("vec_id").as("a_id"), col("v").as("a_v"))
    val b = vecCorpus.select(col("vec_id").as("b_id"), col("v").as("b_v"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", round(Similarity.cosine(col("a_v"), col("b_v")), 4))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos"))
      .orderBy("a_id", "b_id")
  }
}
