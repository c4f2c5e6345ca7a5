package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flagship multi-join analytics in classic TPC-H shapes — the "does the
  * engine run a real reporting workload end to end" tier above the
  * single-operator queries. Everything is declarative: Catalyst picks
  * broadcast vs sort-merge per side (the filtered dims fall under the
  * broadcast threshold; the fact-fact join shuffles on the key), pushes
  * the date/segment predicates into the parquet scans, and AQE re-plans
  * at stage boundaries. Revenue aggregates run in exact decimal
  * (graft.ops.Det) so results are shuffle-order and cross-engine stable.
  */
object Analytics {

  /** Date-spine zero-fill: daily order counts/revenue over a calendar
    * scaffold so days with NO orders appear as explicit zeros — the gap a
    * bare groupBy silently leaves and every reporting/time-series
    * pipeline has to repair. The spine is a generated `sequence` (one row
    * per day — broadcast-sized for any sane range); the daily aggregate
    * shuffles once; the fill is a broadcast left join. Both engines cast
    * to DATE explicitly (DuckDB's date_trunc returns DATE, Spark's
    * TIMESTAMP — an implicit cast would hash-diverge). */
  def dateSpineFill(spark: org.apache.spark.sql.SparkSession, orders: DataFrame,
                    from: String = "1997-01-01", until: String = "1997-04-01"): DataFrame = {
    val lastDay = date_sub(to_date(lit(until)), 1)
    val spine = spark.range(1)
      .select(explode(sequence(to_date(lit(from)), lastDay)).as("day"))
    val daily = orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice"), 2).as("sum_price"))
    // broadcast the RIGHT side: the preserved (left) side of a left
    // outer join cannot be the broadcast build side, so a hint there is
    // silently ignored — `daily` (one row per active day) is the
    // genuinely tiny side anyway
    spine.join(broadcast(daily), Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_price"), lit(0.0)).as("sum_price"))
      .orderBy("day")
  }

  /** Q3 shape — shipping priority: top-10 unshipped-revenue orders for
    * one market segment. Selective dim (filtered customer) broadcast into
    * the orders⋈lineitem fact join; sort+limit collapses to
    * TakeOrderedAndProject (O(k) per partition, no global sort). */
  def q3Shipping(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 segment: String = "BUILDING", cutoff: String = "1998-01-01"): DataFrame =
    customer.filter(col("c_mktsegment") === segment)
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(Det.price(col("l_extendedprice")) * Det.oneMinus(col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)

  /** Q10 shape — returned-item reporting: top-20 customers by revenue
    * lost to returns in one quarter. Fact filter (returnflag) pushed to
    * the lineitem scan; nation broadcast; grouped on the customer key
    * then top-k via TakeOrderedAndProject. */
  def q10Returns(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 nation: DataFrame, qStart: String = "1996-01-01",
                 qEnd: String = "1996-04-01"): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit(qStart).cast("timestamp") &&
        col("o_orderdate") < lit(qEnd).cast("timestamp"))
      .join(lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(Det.price(col("l_extendedprice")) * Det.oneMinus(col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  /** Q14 shape — promotion effect: per ship-month, the share of revenue
    * from PROMO-type parts. Conditional aggregation (CASE inside SUM —
    * the no-otherwise form sums to NULL when a month has no promo rows,
    * mirrored exactly by SQL CASE without ELSE); the ratio is formed
    * from the two exact decimal sums in pure double arithmetic. */
  def q14Promo(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val discPrice = Det.price(col("l_extendedprice")) * Det.oneMinus(col("l_discount"))
    lineitem.join(part, col("l_partkey") === col("p_partkey"))
      // cast to DATE: DuckDB's date_trunc returns DATE at month/year
      // granularity while Spark keeps TIMESTAMP
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", discPrice)).as("promo_dec"),
        sum(discPrice).as("total_dec"))
      .select(col("ship_month"),
        (Det.rfloor(
          lit(100.0) * coalesce(col("promo_dec").cast("double"), lit(0.0)) /
            col("total_dec").cast("double"), 4) + lit(0.0)).as("promo_share"),
        col("total_dec").cast("double").as("total_revenue"))
      .orderBy("ship_month")
  }

  /** Q7 shape — volume shipping between two nations: revenue by
    * (supplier nation, customer nation, ship year) for the two nation
    * pairs, either direction. The classic two-dimension-table-aliases
    * query: nation joins twice under different roles (supplier side via
    * lineitem⋈supplier, customer side via orders⋈customer); both are
    * broadcast dims, the fact-fact lineitem⋈orders join is the one big
    * shuffle, and the pair predicate is a pushed-down disjunction over
    * the two broadcast outputs. */
  def q7VolumeShipping(lineitem: DataFrame, supplier: DataFrame, orders: DataFrame,
                       customer: DataFrame, nation: DataFrame,
                       nationA: String = "NATION_3", nationB: String = "NATION_7",
                       from: String = "1996-01-01", until: String = "1998-01-01"): DataFrame = {
    val suppNation = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val custNation = nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === nationA && col("cust_nation") === nationB) ||
          (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(Det.price(col("l_extendedprice")) * Det.oneMinus(col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q8 shape — national market share: one nation's fraction of the
    * discounted revenue for a part type sold into one region, by order
    * year. The deepest join tree in the suite (lineitem⋈orders fact-fact
    * shuffle surrounded by five broadcast dims, nation twice under
    * different roles) feeding a conditional-share aggregate: the share
    * ratio is formed from two exact decimal sums per year, so the one
    * double division is the only floating-point op. */
  def q8MarketShare(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                    orders: DataFrame, customer: DataFrame, nation: DataFrame,
                    region: DataFrame, targetNation: String = "NATION_5",
                    regionName: String = "ASIA", partType: String = "STANDARD",
                    from: String = "1996-01-01", until: String = "1998-01-01"): DataFrame = {
    val suppNation = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val custRegion = region.filter(col("r_name") === regionName)
      .join(nation, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val volume = Det.price(col("l_extendedprice")) * Det.oneMinus(col("l_discount"))
    lineitem
      .join(part.filter(col("p_type") === partType), col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custRegion), col("c_nationkey") === col("c_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === targetNation, volume)).as("nation_dec"),
        sum(volume).as("total_dec"))
      .select(col("o_year"),
        (Det.rfloor(coalesce(col("nation_dec").cast("double"), lit(0.0)) /
          col("total_dec").cast("double"), 6) + lit(0.0)).as("mkt_share"),
        col("total_dec").cast("double").as("total_volume"))
      .orderBy("o_year")
  }

  /** Q19 shape — discounted revenue under an OR-of-ANDs predicate
    * (brand × size-range × quantity-range disjuncts). The point is the
    * PUSHDOWN: the part-only conjuncts (brand, size) reach the part
    * scan, the lineitem-only quantity bounds reach the lineitem scan
    * (derived from the disjunction's hull), and the residual OR
    * evaluates post-join — Catalyst's CNF extraction at work. One
    * broadcast join (filtered part is tiny), one exact-decimal sum. */
  def q19Discount(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 50) &&
          col("l_quantity").between(20, 30))
    lineitem.join(part, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(
        sum(Det.price(col("l_extendedprice")) * Det.oneMinus(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q5 shape — local supplier volume: revenue by nation for one region
    * and one order year, counting only lineitems where the supplier and
    * the customer share a nation. region→nation→supplier chain broadcasts
    * (tiny dims); lineitem⋈orders is the one large shuffle. */
  def q5LocalVolume(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                    supplier: DataFrame, nation: DataFrame, region: DataFrame,
                    regionName: String = "ASIA", yearStart: String = "1996-01-01",
                    yearEnd: String = "1997-01-01"): DataFrame =
    region.filter(col("r_name") === regionName)
      .join(nation, col("n_regionkey") === col("r_regionkey"))
      .join(supplier, col("s_nationkey") === col("n_nationkey"))
      .join(lineitem, col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") >= lit(yearStart).cast("timestamp") &&
        col("o_orderdate") < lit(yearEnd).cast("timestamp"))
      .join(customer, col("c_custkey") === col("o_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(Det.price(col("l_extendedprice")) * Det.oneMinus(col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
}
