package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators. One shuffle on the partition key, then a
  * per-partition sort; running aggregates use exact decimal accumulation so
  * the emitted doubles don't depend on the engine's internal frame
  * evaluation strategy (Spark accumulates incrementally, DuckDB uses
  * segment trees — only exact arithmetic hashes identically on both).
  */
object Windows {

  /** Top-3 orders per customer: row_number/rank/dense_rank with a total
    * order (price desc, key asc tiebreak). At scale this is the
    * shuffle-once top-k; for tiny k per huge partition count, AQE handles
    * skew, or pre-aggregate with a partial top-k per map task. */
  def rankTopK(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "drnk")
      .orderBy("o_custkey", "rn")
  }

  /** lag/lead of event value per user. Window order is the unique
    * event_id (monotone with ts in the generator) — ordering by a unique
    * integer sidesteps ns-vs-µs timestamp truncation differences. */
  def lagLead(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .select(
        col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy("user_id", "event_id")
  }

  /** Running total per customer with an explicit ROWS frame. */
  def runningFrame(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_total"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE frame over a numeric ordering key: for each event, aggregate
    * over all same-type events within [value-10, value]. The 2-decimal
    * double is lifted to exact integer cents (decimal round, then bigint)
    * so the RANGE boundary is integral and identical across engines. */
  def rangeFrame(events: DataFrame): DataFrame = {
    val cents = (col("value") * 100).cast("decimal(18,0)").cast("bigint")
    val w = Window.partitionBy(col("event_type")).orderBy(col("value_cents"))
      .rangeBetween(-1000L, Window.currentRow)
    events
      .withColumn("value_cents", cents)
      .select(
        col("event_type"), col("event_id"), col("value_cents"),
        count(lit(1)).over(w).as("n_in_band"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("sum_in_band"))
      .orderBy("event_type", "event_id")
  }

  /** first/last/nth value per partition with an explicit full frame —
    * last_value over the default frame is the classic silent bug (frame
    * ends at CURRENT ROW), so the frame is spelled out. */
  def firstLast(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Relative-position window family: percent_rank and cume_dist per
    * segment over (acctbal, custkey) — the unique tiebreak makes the
    * ordering total, so the rank ratios are exact integer rationals that
    * both engines evaluate to identical IEEE doubles (no libm, no
    * rounding ties). */
  def percentileRanks(customer: DataFrame): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    customer
      .select(
        col("c_custkey"), col("c_mktsegment"),
        graft.ops.Det.rfloor(percent_rank().over(w), 6).as("pct_rank"),
        graft.ops.Det.rfloor(cume_dist().over(w), 6).as("cume"))
      .orderBy("c_custkey")
  }

  /** ntile quartiles of customer balance (unique tiebreak key ⇒
    * deterministic bucket edges).
    *
    * Scale-safe two-pass plan instead of `ntile(4) over (order by ...)`:
    * a no-partition window funnels EVERY row through one task (the
    * WindowExec "No Partition Defined" warning), which is the canonical
    * 100 TB failure. Here:
    *   1. range-partition + sort-within-partition on the total order
    *      (RangePartitioner samples boundaries — distributed, balanced);
    *   2. ONE small job collects per-partition row counts (P longs) to
    *      the driver — model parameters, not data;
    *   3. global rank = broadcast cumulative offset of the partition +
    *      local position (monotonically_increasing_id after the
    *      partition-local sort encodes pid<<33 | position);
    *   4. bucket from the rank via exact ntile arithmetic (first n%k
    *      buckets hold ceil(n/k) rows) — a map-side CASE, no shuffle.
    * Both passes reuse the same range exchange; nothing is globally
    * sorted on one node. */
  def ntileQuartiles(customer: DataFrame, k: Int = 4): DataFrame =
    globalNtile(
      customer.select(col("c_custkey"), col("c_acctbal")),
      k, Seq(col("c_acctbal").asc, col("c_custkey").asc), "quartile")
      .orderBy("c_custkey")

  /** The distributed global-ntile core (extracted r9 so the lift table
    * can reuse it): appends `bucketCol` ∈ [1, k] assigned by exact ntile
    * arithmetic over the TOTAL order `sortCols` — first n%k buckets hold
    * ⌈n/k⌉ rows. Two passes over ONE pinned range exchange:
    *   1. range-partition + sort-within-partition on the total order;
    *   2. a P-long per-partition count collect (model parameters, not
    *      data) → broadcast cumulative offsets;
    *   3. global rank = offset(pid) + local position
    *      (monotonically_increasing_id after the partition-local sort
    *      encodes pid<<33 | position); bucket via the exact arithmetic —
    *      a map-side CASE, no further shuffle.
    * localCheckpoint: BOTH passes must see the SAME range boundaries,
    * but RangePartitioner seeds its reservoir sample with the RDD id —
    * two plan executions can draw different boundaries (observed at
    * sf0.1: counts from pass 1 misaligned with pass 2's partitions →
    * quartiles off by a partition). Materializing the exchange once
    * pins the partitioning; it is also the efficient form — the shuffle
    * output is computed once, scanned twice. */
  private[graft] def globalNtile(df: DataFrame, k: Int,
      sortCols: Seq[Column], bucketCol: String): DataFrame = {
    val parts = 32
    val base = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val counts = new Array[Long](parts)
    base.groupBy(spark_partition_id().as("pid")).agg(count(lit(1)).as("cnt"))
      .collect().foreach(r => counts(r.getInt(0)) = r.getLong(1))
    val n = counts.sum
    val offsets = counts.scanLeft(0L)(_ + _).init // rows before partition i
    val q = n / k
    val rem = n % k
    val offArr = array(offsets.map(lit): _*)
    val pid = shiftright(col("mid"), 33).cast("int")
    val rank = element_at(offArr, pid + 1) + (col("mid") bitwiseAND ((1L << 33) - 1)) + 1L
    val bigCut = rem * (q + 1) // last rank held by a ceil-sized bucket
    val bucket = when(rank <= bigCut, (rank - 1) / (q + 1) + 1)
      .otherwise(lit(rem) + (rank - 1 - bigCut) / greatest(lit(q), lit(1L)) + 1)
    base
      .withColumn("mid", monotonically_increasing_id())
      .withColumn(bucketCol, bucket.cast("long"))
      .drop("mid")
  }

  /** RECENCY FEATURE (r9) — minutes since the user's LAST marker event
    * (default 'purchase') strictly BEFORE each event: the classic
    * feature-engineering window every churn/propensity model consumes
    * ("time since last conversion"). The frame is rows-unbounded-to-1-
    * PRECEDING, so an event never sees itself (a purchase row measures
    * the gap to the PREVIOUS purchase — the inter-purchase interval).
    * Events before the first marker emit the -1 sentinel: the feature
    * column stays non-null BIGINT (a trainer's featurizer wants a
    * fixed-width numeric, not a null to impute downstream); lag in
    * exact integer µs floor-division.
    *
    * Scale: one user-partitioned sort — frames never leave the
    * partition; output is event-grain (a feature column, not an
    * aggregate), exactly the shape a feature store materializes. */
  def recencyFeature(events: DataFrame, markerType: String = "purchase"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("last_marker_us",
        max(when(col("event_type") === markerType, col("ts_us"))).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"),
        when(col("last_marker_us").isNull, lit(-1L))
          .otherwise(expr("(ts_us - last_marker_us) div 60000000"))
          .as("mins_since_marker"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** TIME-interval range frame: per-user trailing 2-hour average over
    * event time — the frame every "rolling metric over the last N
    * hours" dashboard needs. The frame is defined on EPOCH SECONDS
    * (integer range), so the bound is exact in both engines; the running
    * mean uses an exact decimal sum over the frame divided once.
    * Partitioned by user — ranks and frames never leave the partition. */
  def timeRangeFrame(events: DataFrame, trailingSeconds: Long = 7200): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_s")
      .rangeBetween(-trailingSeconds, 0)
    events
      .select(col("user_id"), col("event_id"),
        // integer FLOOR division, matching the oracle's epoch_us//1000000
        // (DuckDB `//` floors) for all sign ranges: subtracting the
        // non-negative pmod makes the numerator exactly divisible, so
        // `div`'s truncation equals floor — exact pre-1970 and beyond
        // double's 2^53 (Column./ is double division + truncation)
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000")
          .as("ts_s"),
        col("value"))
      .withColumn("n_2h", count(lit(1)).over(w))
      .withColumn("avg_2h",
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
          count(lit(1)).over(w))
      .select("user_id", "event_id", "ts_s", "n_2h", "avg_2h")
      .orderBy("user_id", "event_id")
  }

  /** Gaps-and-islands: contiguous runs of order keys per priority class.
    * The classic `key - row_number()` trick: consecutive keys share one
    * island id, a gap starts a new one; the run summary is then a plain
    * groupBy. Partitioned by priority so the window never needs a global
    * sort — at 100 TB the partition key keeps ranks local. */
  def gapsIslands(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    orders
      .select(col("o_orderpriority"), col("o_orderkey"))
      .withColumn("island", col("o_orderkey") - row_number().over(w))
      .groupBy(col("o_orderpriority"), col("island"))
      .agg(
        min(col("o_orderkey")).as("start_key"),
        max(col("o_orderkey")).as("end_key"),
        count(lit(1)).as("n"))
      .select("o_orderpriority", "start_key", "end_key", "n")
      .orderBy("o_orderpriority", "start_key")
  }

  /** Daily cumulative DISTINCT users per event type — the growth curve
    * every analytics dashboard opens with. The naive window form,
    * `size(collect_set(user) OVER cumulative)`, holds the whole distinct
    * set as per-row window state (O(days·distinct) memory per partition
    * — a scale wall); the scalable identity is that a user enters the
    * cumulative count exactly once, on their FIRST day: reduce users to
    * (type, user) → min(day) (one user-keyed aggregate with map-side
    * partials), roll first-days up to per-day new-user counts, and run
    * a plain cumulative sum over the tiny (type, day) frame. Exchanges:
    * one user-keyed, one day-keyed (both shrink monotonically), one
    * type-partitioned window over day-cardinality rows. Days with no
    * new users emit no row (mirror the oracle; join [[ScalarFns]]'
    * date spine to densify when needed). */
  def cumulativeDistinct(events: DataFrame): DataFrame = {
    val firstDay = events
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "user_id")
      .agg(min(col("day")).as("first_day"))
    val newUsers = firstDay
      .groupBy(col("event_type"), col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    newUsers
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy("event_type", "day")
  }

  /** Forward-fill: carry the last non-null observation down each
    * partition (`last(..., ignoreNulls)` over an unbounded-preceding
    * frame) — the canonical gap-repair for sparse time series. Nulls are
    * injected deterministically (the clean table has none); leading nulls
    * stay null in both engines. Running frames keep O(1) state per
    * partition — no rescan per row. */
  def fillForward(customer: DataFrame): DataFrame = {
    val bal = when(col("c_custkey") % 7 === 2, lit(null).cast("double"))
      .otherwise(col("c_acctbal"))
    val w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    customer
      .select(col("c_mktsegment"), col("c_custkey"), bal.as("bal"))
      .withColumn("bal_filled", last(col("bal"), ignoreNulls = true).over(w))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** PARETO / CUMULATIVE-SHARE AUDIT (r8) — the 80/20 question per
    * segment: how many top customers carry 80% of revenue, and what
    * share does the top decile hold. Revenue in exact integer cents;
    * the 80% threshold is the EXACT integer cross-multiplication
    * `5·cum ≥ 4·total` (a double cumshare ≥ 0.8 compare misrounds at
    * exactly the boundary customer — the lossless-bound discipline);
    * the only divisions are the two final rounded shares. One
    * customer-keyed aggregate, one segment window stack on a
    * |customers|-grain frame, |segments|-row output. */
  def cumulativeShare(orders: DataFrame, customer: DataFrame): DataFrame = {
    val spend = orders
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice") * 100).cast("decimal(18,0)").cast("bigint")).as("cents"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("cents").desc, col("o_custkey"))
    val ranked = spend
      .withColumn("rk", row_number().over(w))
      .withColumn("cum", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum(col("cents")).over(Window.partitionBy("c_mktsegment")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("c_mktsegment")))
    ranked
      .groupBy(col("c_mktsegment"))
      .agg(
        min(col("n")).as("n_cust"),
        min(col("total")).as("total_cents"),
        min(when(col("cum") * 5 >= col("total") * 4, col("rk"))).as("n80"),
        Det.rfloor(max(when(col("rk") === expr("(n + 9) div 10"),
          col("cum"))).cast("double") / min(col("total")).cast("double"), 4)
          .as("share_top_decile"))
      .orderBy("c_mktsegment")
  }

  /** INTERVAL COALESCE (r8) — merge overlapping per-key validity
    * windows into maximal disjoint spans: the SCD repair / session-
    * from-intervals primitive (contrast `join_interval_overlap`, which
    * PAIRS intervals; this collapses them). Intervals synthesized with
    * the same law as the overlap join: [ts, ts + windowUs] in exact
    * integer µs. The classic two-window form: an interval starts a new
    * island iff its start exceeds the running max end of all EARLIER
    * intervals (strictly — touching spans merge), island id = running
    * sum of the start flags; both windows share ONE user_id exchange
    * (same partitioning + order), the rollup is island-grain. At
    * 100 TB: one hash exchange on the key, no self-joins, no
    * interval×interval product. */
  def intervalMerge(events: DataFrame, windowUs: Long = 600000000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("s"), col("event_id"))
    val runMaxPrev = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + windowUs).as("e"))
      .withColumn("new_island",
        when(runMaxPrev.isNull || col("s") > runMaxPrev, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "island")
      .agg(min(col("s")).as("start_us"), max(col("e")).as("end_us"),
        count(lit(1)).as("n_intervals"))
      .select(col("user_id"), col("island"), col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"), col("n_intervals"))
      .orderBy("user_id", "island")
  }
}
