package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Session-hygiene sweep over EVERY declared query key:
  *
  *  1. No query's optimized plan may contain a partition-less Window
  *     outside the two contract sites (diff_positional: global row
  *     position IS the reference semantics; text_zipf: the window ranks a
  *     k-row top-list). A partition-less WindowExec funnels the whole
  *     input through one task — at 100 TB that's a stalled stage, so any
  *     NEW site must fail review here first.
  *
  *  2. After evaluating every query, the session must hold no cached
  *     RDDs. Operator-internal `.persist()` without an unpersist pins the
  *     entry in the CacheManager forever (strong reference — no GC can
  *     reclaim it), which on a long-lived production session means the
  *     whole corpus slowly accumulates in executor storage memory.
  *     Operators that materialize multi-consumer intermediates use
  *     `localCheckpoint` (ContextCleaner-released once unreachable) or
  *     try/finally unpersist; this test is the regression guard.
  */
class HygieneSpec extends SparkSpec {

  // one shared evaluation pass feeds both audits (building + running all
  // 154 queries once is the expensive part)
  private lazy val bareWindowOffenders: Set[String] = {
    // isolate from caches other suites may have left in the shared session
    spark.catalog.clearCache()
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (k, fn) =>
      val df = fn(spark, sfDir)
      val bare = df.queryExecution.optimizedPlan.collectWithSubqueries {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      df.count()
      if (bare.nonEmpty) Some(k) else None
    }.toSet
  }

  test("partition-less Window appears ONLY at the two contract sites") {
    val allowed = Set("diff_positional", "text_zipf")
    assert(bareWindowOffenders == allowed,
      s"unexpected partition-less Window sites: ${bareWindowOffenders -- allowed}; " +
        s"missing contract sites: ${allowed -- bareWindowOffenders}")
  }

  test("no net cached RDDs after evaluating every query") {
    bareWindowOffenders // force the evaluation pass
    val sc = spark.sparkContext
    // localCheckpoint blocks are released asynchronously by the
    // ContextCleaner once the plans are unreachable — poll GC for that;
    // a CacheManager-pinned persist() leak survives any number of GCs
    // and fails the assert below.
    var tries = 0
    while (sc.getPersistentRDDs.nonEmpty && tries < 60) {
      System.gc()
      Thread.sleep(250)
      tries += 1
    }
    assert(sc.getPersistentRDDs.isEmpty,
      s"leaked cached RDDs after full query sweep: " +
        sc.getPersistentRDDs.values.map(_.toString).mkString("; "))
  }
}
