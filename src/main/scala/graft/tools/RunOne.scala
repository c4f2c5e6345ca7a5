package graft.tools



/** Profiling harness for ONE declared query under bench-identical session
  * settings, with DAGScheduler job-timing logs exposed so the per-job cost
  * of iterative operators is readable. Not part of the driver contract.
  * Usage: RunOne <sfDir> <key> [runs]   (stderr carries the job log)
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val key = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    // shared builder (Session.scala): bench-identical session settings
    val spark = graft.Session.build(cpusDefault = "32")
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.INFO)
    sys.env.get("RUNONE_CONF").foreach { kvs =>
      kvs.split(";").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      }
    }
    val fn = graft.SparkEntry.queries(key)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"RUNONE $key run=$i rows=$n time=$dt%.2f s")
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      System.gc()
    }
    spark.stop()
  }
}
