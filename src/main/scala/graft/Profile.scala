package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the clustering pipeline (not part of the
  * driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    val corpus = graft.llm.Corpus.docCorpus(docs)
    // warm
    corpus.count()
    time("jaccard_warm")(graft.llm.Dedup.ngramJaccard(corpus).count())
    spark.catalog.clearCache(); System.gc()
    time("jaccard")(graft.llm.Dedup.ngramJaccard(corpus).count())
    spark.catalog.clearCache(); System.gc()
    time("cluster_total")(graft.llm.Dedup.nearDupClusters(corpus).count())
    spark.catalog.clearCache(); System.gc()
    time("pipeline_total")(graft.llm.TrainingPrep.prepare(docs).count())
    spark.stop()
  }
}
