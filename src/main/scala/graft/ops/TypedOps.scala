package graft.ops

import org.apache.spark.sql.DataFrame

/** Typed `Dataset[T]` row for the orders projection used below. */
final case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                          o_totalprice: Double, o_orderpriority: String)

/** Typed output: per-customer spend summary (cents kept integral so the
  * fold is associative and engine-exact). */
final case class CustSpend(o_custkey: Long, n_orders: Long, total_cents: Long,
                           max_order: Double)

/** Typed Dataset surface: case-class `Encoder`s, lambda filters,
  * `groupByKey`/`mapGroups` — the API tier for per-entity imperative
  * logic that doesn't decompose into column expressions.
  *
  * Honest scale note: `mapGroups` is OPAQUE to Catalyst — no partial
  * aggregation, the whole group shuffles to one task (fine here: the
  * per-customer group is tiny and the fold is O(group)). When the logic
  * IS expressible as columns or an `Aggregator` (see `udaf_typed`),
  * prefer those — they keep map-side combine and codegen. This query
  * exists to pin the typed path's semantics against the same SQL oracle
  * as the relational form.
  */
object TypedOps {

  /** Fulfilled-order spend per customer via the typed API: filter on a
    * field predicate, groupByKey on the entity, one imperative fold per
    * group. Money accumulated in integer cents (`round(x·100)`), so the
    * result is identical for any iteration order. */
  def typedCustomerSpend(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .as[OrderRow]
      .filter(_.o_orderstatus == "F")
      .groupByKey(_.o_custkey)
      .mapGroups { (k, it) =>
        // seed max with -inf, not 0.0 — a group of all-non-positive
        // prices must yield its true (negative) maximum, like SQL max()
        var n = 0L; var cents = 0L; var mx = Double.NegativeInfinity
        it.foreach { o =>
          n += 1
          cents += math.round(o.o_totalprice * 100)
          if (o.o_totalprice > mx) mx = o.o_totalprice
        }
        CustSpend(k, n, cents, mx)
      }
      .toDF()
      .orderBy("o_custkey")
  }
}
