package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

/** Scalar function families — all codegen'd built-ins (no UDFs in the hot
  * path). One representative query per family; each stays inside
  * WholeStageCodegen so the function cost is a per-row register op, not a
  * virtual call.
  */
object ScalarFns {

  /** explode_outer: generator that PRESERVES rows whose array is empty
    * (emitting one null element) — the left-join semantics of unnesting,
    * vs plain `explode` which silently drops them. Arrays are key-derived
    * (o_orderkey % 3 elements, a third of them empty) so the drop/keep
    * difference is visible and oracle-checked. */
  def explodeOuter(orders: DataFrame): DataFrame = {
    val n = pmod(col("o_orderkey"), lit(3))
    val arr = when(n > 0, sequence(lit(1L), n.cast("long")))
      .otherwise(array().cast("array<bigint>"))
    orders
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"), explode_outer(arr).as("v"))
      .orderBy(col("o_orderkey"), col("v").asc_nulls_first)
  }

  /** String family on `part`. */
  def stringFns(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      lower(col("p_brand")).as("brand_lower"),
      trim(concat(lit("  "), col("p_type"), lit("  "))).as("type_trim"),
      substring(col("p_type"), 1, 5).as("type_pfx"),
      concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
      length(col("p_name")).cast("long").as("name_len"),
      regexp_replace(col("p_name"), "a", "@").as("name_repl"),
      lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
      col("p_type").like("%BRASS%").cast("long").as("is_brass"),
      regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"))
      .orderBy("p_partkey")

  /** Date/time family on `orders`. */
  def dateFns(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("d"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
      datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).cast("long").as("days_to_2002"),
      add_months(col("o_orderdate").cast("date"), 2).as("plus_2m"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  /** Math family on `part` (round on exact decimal, not raw double — the
    * two engines disagree on double tie-breaking). */
  def mathFns(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      round(col("p_retailprice").cast("decimal(18,2)"), 1).cast("double").as("price_r1"),
      floor(col("p_retailprice")).as("price_floor"),
      ceil(col("p_retailprice")).as("price_ceil"),
      abs(col("p_size") - 25).cast("long").as("size_dev"),
      pow(col("p_size").cast("double"), 2.0).as("size_sq"),
      sqrt(col("p_size").cast("double")).as("size_sqrt"),
      pmod(col("p_partkey"), lit(7)).as("key_mod7"),
      signum((col("p_size") - 25).cast("double")).cast("long").as("size_sign"))
      .orderBy("p_partkey")

  /** Array family incl. higher-order functions on `embeddings`. Floats are
    * widened to double before arithmetic; the fold is sequential in array
    * order on both engines. */
  def arrayFns(embeddings: DataFrame): DataFrame = {
    val e = col("embedding")
    embeddings.select(
      col("vec_id"),
      size(e).cast("long").as("dim"),
      element_at(e, 1).cast("double").as("first_elem"),
      size(filter(e, x => x > lit(0.0f))).cast("long").as("n_pos"),
      round(aggregate(e, lit(0.0), (acc, x) => acc + x.cast("double")), 5).as("sum_all"),
      array_max(e).cast("double").as("max_elem"),
      array_min(e).cast("double").as("min_elem"),
      element_at(sort_array(e, asc = false), 2).cast("double").as("second_largest"))
      .orderBy("vec_id")
  }

  /** GROUPED-array build + higher-order post-processing (r8) — the shape
    * [[arrayFns]] doesn't cover: the array is BUILT from rows
    * (collect_list per order, sorted by line number so the sequence is a
    * total order, not shuffle luck), then folded with HOFs — per-entity
    * sequence features, the feature-engineering primitive a training
    * pipeline runs per document/session. The synthetic lineitem REUSES
    * line numbers within an order, so the sort key is the full
    * (l_linenumber, l_quantity) struct — a total order up to equal
    * values, where any permutation is the identical list. Quantities
    * are integer-valued doubles, so the sequential fold is exact and
    * engine-portable; the
    * even-count cast goes through BIGINT on both engines (double `%` on
    * a fractional value would be fmod roulette). One hash aggregate
    * with map-side partial lists; everything after runs at order grain. */
  def arrayAggHof(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("items"))
      .select(col("l_orderkey"),
        transform(col("items"), x => x.getField("l_quantity")).as("qs"))
      .select(
        col("l_orderkey"),
        size(col("qs")).cast("long").as("n_items"),
        aggregate(col("qs"), lit(0.0), (a, x) => a + x * x).as("sum_sq"),
        array_max(col("qs")).as("max_qty"),
        size(filter(col("qs"), x => x.cast("long") % 2 === 0)).cast("long").as("n_even"),
        element_at(col("qs"), 1).as("first_qty"))
      .orderBy("l_orderkey")

  /** Hash/digest family: content-addressing and checksumming for
    * pipeline provenance (md5/sha256 are bit-identical across engines;
    * xxhash64/crc32 are Spark-side — used for partitioning, not parity). */
  def hashFns(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      md5(col("p_name").cast("binary")).as("name_md5"),
      sha2(col("p_name").cast("binary"), 256).as("name_sha256"),
      length(md5(col("p_name").cast("binary"))).cast("long").as("md5_len"))
      .orderBy("p_partkey")

  /** Conditional family: CASE chains, nullif/coalesce/nvl, greatest/least
    * — all codegen'd branches. Nulls injected deterministically. */
  def conditionalFns(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      when(col("p_size") < 10, "small")
        .when(col("p_size") < 30, "medium")
        .otherwise("large").as("size_class"),
      nullif(col("p_brand"), lit("Brand#23")).as("brand_or_null"),
      coalesce(nullif(col("p_brand"), lit("Brand#23")), lit("(masked)")).as("brand_masked"),
      greatest(col("p_size"), lit(25)).cast("long").as("size_floor25"),
      least(col("p_size"), lit(25)).cast("long").as("size_cap25"),
      (col("p_size") % 2 === 0).cast("long").as("is_even"))
      .orderBy("p_partkey")

  /** Bitwise family on `part` keys: AND/OR/XOR, shifts, popcount —
    * the bit-packing toolkit (bitmap flags, bucket ids, simhash-style
    * fingerprint manipulation). All codegen'd integer ops. */
  def bitwiseFns(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      col("p_partkey").bitwiseAND(lit(255L)).as("and255"),
      col("p_partkey").bitwiseOR(lit(16L)).as("or16"),
      col("p_partkey").bitwiseXOR(col("p_size").cast("long")).as("xor_size"),
      shiftleft(col("p_size"), 2).cast("long").as("shl2"),
      shiftright(col("p_partkey"), 3).as("shr3"),
      bit_count(col("p_partkey")).cast("long").as("nbits"))
      .orderBy("p_partkey")

  /** Struct family on `nation`: build a named struct, access fields,
    * serialize to JSON and extract back — the nested-record surface a
    * pipeline uses for typed payload columns. String-typed fields keep
    * the JSON text identical across engines (no numeric formatting). */
  def structFns(nation: DataFrame): DataFrame = {
    val s = struct(col("n_name").as("name"), col("n_regionkey").cast("string").as("region"))
    nation.select(
      col("n_nationkey"),
      s.getField("name").as("s_name"),
      to_json(s).as("js"),
      get_json_object(to_json(s), "$.region").as("region_rt"))
      .orderBy("n_nationkey")
  }

  /** ERROR-SAFE ARITHMETIC (r8) — the `try_*` family: under ANSI
    * semantics a single bad row (divide-by-zero, overflow, uncastable
    * string) kills a 100 TB job at hour three; `try_divide` /
    * `try_cast` / `try_add` turn the row-level error into NULL so the
    * pipeline quarantines instead of dying. Each column exercises one
    * failure class with a deterministic mix of failing and passing
    * rows; the oracle mirrors the SEMANTICS (NULLIF guard, TRY_CAST,
    * overflow CASE) since DuckDB has no try_add. */
  def tryArith(events: DataFrame): DataFrame = {
    events.select(
      col("event_id"),
      // /0 for event_id % 5 == 0 → null, real quotient otherwise
      expr("try_divide(value, cast(event_id % 5 as double))").as("td"),
      // castable on even ids, garbage suffix on odd → null
      expr("""try_cast(concat(cast(event_id % 100 as string),
             | case when event_id % 2 = 1 then 'x' else '' end) as bigint)""".stripMargin)
        .as("tc"),
      // overflows Long.Max for event_id % 2000 > 1000 → null
      expr(s"try_add(${Long.MaxValue - 1000L}L, event_id % 2000)").as("ta"))
      .orderBy("event_id")
  }

  /** JSON/map family on `events.props`. */
  def mapJsonFns(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_val"),
      size(from_json(col("props"), MapType(StringType, LongType))).cast("long").as("n_keys"),
      element_at(map_keys(from_json(col("props"), MapType(StringType, LongType))), 1).as("first_key"))
      .orderBy("event_id")
}
