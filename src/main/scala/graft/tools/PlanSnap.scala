package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes `plans/<dir>/<key>_<suffix>.txt` — the `.explain("formatted")`
  * output of each named query — the before/after plan evidence trail for
  * optimization rounds. Usage:
  *   sbt "runMain graft.tools.PlanSnap <sfDir> <outDir> <suffix> key1,key2,..."
  * e.g. runMain graft.tools.PlanSnap /root/testdata/sf0.01 plans/r13 before analytics_q2_min_cost
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanSnap <sfDir> <outDir> <suffix> <keys,csv>")
    val Array(sfDir, outDir, suffix, keysCsv) = args
    val keys = keysCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[plansnap] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
