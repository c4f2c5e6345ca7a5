package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet source layer.
  *
  * The reference (syncquill.py:38-52, 60-76) scans two external sources —
  * a Google Sheet (all-string, header row = schema) and a BigQuery table —
  * and materializes both fully in driver memory. Here every source is a
  * distributed, columnar, lazily-read parquet `DataFrame`; Catalyst pushes
  * projections and predicates into the scan (`PushedFilters` / `ReadSchema`
  * in `.explain`), so nothing is materialized before the sink.
  *
  * Tables are the driver-generated TPC-H-ish set described in TESTDATA.md.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Lazy distributed scan of one table under the given scale-factor dir. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet `timestamp[ns]`, which Spark 4's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read the physical INT64 nanos
    * via the legacy long mapping, then rebuild a µs-precision timestamp
    * (integer `div`, not `/` — ns-since-epoch overflows double precision).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
