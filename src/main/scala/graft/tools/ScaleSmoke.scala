package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke for the EXACT all-pairs Jaccard baselines
  * (`dedup_ngram_jaccard` / `dedup_cluster`): replicates the sf
  * document corpus N× with key-shifted doc_ids, then times the exact
  * operator with and without the heavy-shingle df cap. The earlier 10×/
  * 30× smokes (ARCHITECTURE.md) covered the banded/bucketed SCALE-PATH
  * operators; this one measures where the quadratic wall of the
  * oracle-baseline pair actually is and what `dfCap` buys — committed
  * so the numbers are reproducible, unlike the earlier ad-hoc /tmp
  * replication scripts.
  *
  * Key-shifted replicas carry IDENTICAL text, so every base document
  * becomes an N-member exact-duplicate component: the all-pairs output
  * grows ~N² per duplicate group, which is HARSHER than real corpus
  * growth (real data adds mostly-unique documents) — a deliberately
  * pessimistic stress for the quadratic baseline.
  *
  * Usage: ScaleSmoke <sfDir> <factor> [dfCap] [skipExact]
  * (`skipExact` skips the uncapped all-pairs runs — at high factors the
  * quadratic baseline is exactly the wall being documented.)
  * Prints one JSON line per timing.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val dfCap = args.lift(2).map(_.toInt).getOrElse(200)
    val skipExact = args.lift(3).contains("skipExact")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the replicated corpus to parquet first so timings
    // measure the operator, not the replication
    val docs = graft.Tables.documents(spark, sfDir)
    val rep = (0 until factor).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val path = s"/tmp/scale_smoke_docs_x$factor"
    rep.write.mode("overwrite").parquet(path)
    val corpus = graft.llm.Corpus.docCorpus(
      spark.read.parquet(path)).localCheckpoint()
    val nDocs = corpus.count()

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      val dt = math.floor((System.nanoTime() - t0) / 1e7 + 0.5) / 100
      println(s"""{"smoke":"$name","factor":$factor,"docs":$nDocs,"rows":$n,"sec":$dt}""")
      spark.catalog.clearCache()
      System.gc()
    }

    // optional fifth arg "containmentOnly" skips the jaccard/cluster
    // walls (already documented) when iterating on the containment pair
    val containmentOnly = args.lift(4).contains("containmentOnly")
    if (!containmentOnly) {
      if (!skipExact) time("ngram_jaccard_exact")(graft.llm.Dedup.ngramJaccard(corpus))
      time(s"ngram_jaccard_dfcap$dfCap")(
        graft.llm.Dedup.ngramJaccard(corpus, dfCap = Some(dfCap)))
      if (!skipExact) time("cluster_exact")(graft.llm.Dedup.nearDupClusters(corpus))
      time(s"cluster_dfcap$dfCap")(
        graft.llm.Dedup.nearDupClusters(corpus, dfCap = Some(dfCap)))
      time("cluster_banded")(graft.llm.Dedup.nearDupClustersBanded(corpus))
    }
    // containment: exact all-pairs baseline vs the lossless prefix-
    // filtered twin (same output rows — the delta is candidate space)
    if (!skipExact) time("containment_exact")(graft.llm.Dedup.ngramContainment(corpus))
    time("containment_prefix")(graft.llm.Dedup.ngramContainmentPrefix(corpus))
    spark.stop()
  }
}
