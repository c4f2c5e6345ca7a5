package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.{PlanWalk, SparkEntry, Tables}

/** Machine-readable PLAN CENSUS over every registered query key: counts
  * of the physical-plan node classes that govern scale behavior
  * (shuffle/broadcast exchanges, scans, join strategies, sorts, windows,
  * aggregates, cartesian products). The committed `plan_census.json` is
  * the plan-shape BASELINE for the whole surface — the per-key answer to
  * "is there a shuffle here that becomes the bottleneck at 100 TB" that
  * PLANS.md gives in prose for a headline subset — and `--check` turns
  * it into a regression gate: regenerate, diff against the committed
  * file, list every key whose plan shape moved.
  *
  * Counting happens on the UNEXECUTED `queryExecution.executedPlan` —
  * after `EnsureRequirements` has inserted the exchanges (sparkPlan
  * carries none) but before a single job has run, so under AQE it is
  * the initial adaptive tree: the deterministic artifact of the code +
  * fixed testdata stats alone. AQE's runtime decisions (coalesced
  * partitions, demoted broadcasts) vary with execution and belong to
  * Bench/ScaleSmoke evidence, not a committed baseline. Keys whose operators run side-effect probes or training at
  * plan-construction time (collapse probe, IVF/PQ/BPE ensure) execute
  * those jobs here too — the same write-time/plan-time split Bench uses,
  * with the persisted-epoch artifacts prewarmed so their query paths
  * census the PROBE plan, not training.
  *
  * Usage:
  *   sbt "runMain graft.tools.PlanCensus"             — regenerate plan_census.json
  *   sbt "runMain graft.tools.PlanCensus --check"     — diff against the committed file, exit 1 on drift
  * Optional first non-flag arg = sf dir (default /root/testdata/sf0.01).
  */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val checkMode = args.contains("--check")
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.01")
    val outPath = "plan_census.json"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the Bench prewarm: persisted-epoch keys must census their probe
    // plan; without the artifacts they would census (and pay) training
    try {
      val corpus = graft.llm.Corpus.docCorpus(Tables.documents(spark, sfDir))
      val idx = corpus.filter(org.apache.spark.sql.functions.col("doc_id") < 100000)
      graft.llm.Dedup.ensureBandIndex(spark, idx)
      graft.llm.Dedup.ensureBloomIndex(spark, idx)
      graft.llm.Similarity.ensureIvfIndex(spark, Tables.embeddings(spark, sfDir))
      graft.llm.Similarity.ensurePqIndex(spark, Tables.embeddings(spark, sfDir))
      graft.llm.Bpe.ensureBpeModel(spark, Tables.documents(spark, sfDir))
      graft.ops.ScaleJoins.ensureBucketed(spark,
        Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
      val ord = Tables.orders(spark, sfDir)
      graft.ops.Aggregates.ensureQuantileHist(spark, ord, epoch = 8201L)
      graft.ops.Aggregates.ensureQuantileHist(spark,
        graft.sync.Snapshots.perturbedOrders(ord), epoch = 8202L)
      ()
    } catch { case _: Throwable => () }

    def censusLine(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // executedPlan WITHOUT collecting: prepareForExecution has run
      // (EnsureRequirements has inserted the exchanges — sparkPlan
      // carries none) but nothing has executed, so under AQE this is
      // the INITIAL adaptive tree: the deterministic artifact of code +
      // fixed testdata stats, before any runtime re-planning
      val nodes = PlanWalk.allNodes(df.queryExecution.executedPlan)
      def n(pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int =
        nodes.count(pred)
      val counts = Seq(
        "shuffle" -> n(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
        "broadcast" -> n(_.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeLike]),
        "filescan" -> n(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
        "smj" -> n(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
        "bhj" -> n(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        "bnlj" -> n(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
        "cartesian" -> n(_.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
        "agg" -> n(p => p.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec]
          || p.isInstanceOf[org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec]
          || p.isInstanceOf[org.apache.spark.sql.execution.aggregate.SortAggregateExec]),
        "sort" -> n(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
        "window" -> n(p => p.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]
          || p.getClass.getSimpleName == "WindowGroupLimitExec"))
      "\"" + name + "\":{" +
        counts.map { case (k, v) => "\"" + k + "\":" + v }.mkString(",") + "}"
    }

    val keys = SparkEntry.queries.keys.toSeq.sorted
    val lines = keys.map { name =>
      try censusLine(name)
      catch { case e: Throwable =>
        System.err.println(s"[census] $name failed: ${e.getMessage}")
        "\"" + name + "\":{\"error\":1}"
      }
    }
    val json = lines.mkString("{\n", ",\n", "\n}\n")

    if (checkMode) {
      val committed = if (Files.exists(Paths.get(outPath)))
        Files.readString(Paths.get(outPath)) else ""
      val oldLines = committed.linesIterator
        .filter(_.trim.startsWith("\"")).map(_.stripSuffix(",").trim)
        .map(l => l.takeWhile(_ != ':') -> l).toMap
      var drift = 0
      lines.map(_.trim).foreach { l =>
        val k = l.takeWhile(_ != ':')
        oldLines.get(k) match {
          case Some(old) if old == l => ()
          case Some(old) =>
            println(s"[census] DRIFT $k\n  committed: $old\n  current:   $l"); drift += 1
          case None =>
            println(s"[census] NEW $k → $l"); drift += 1
        }
      }
      val gone = oldLines.keySet -- lines.map(_.trim.takeWhile(_ != ':'))
      gone.toSeq.sorted.foreach { k => println(s"[census] REMOVED $k"); drift += 1 }
      println(s"[census] ${lines.size} keys checked, $drift drifted")
      spark.stop()
      if (drift > 0) sys.exit(1)
    } else {
      Files.writeString(Paths.get(outPath), json)
      println(s"[census] wrote $outPath (${keys.size} keys)")
      spark.stop()
    }
  }
}
