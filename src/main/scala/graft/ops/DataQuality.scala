package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality constraint checking — the validation pass a pipeline runs
  * before promoting a snapshot: uniqueness, referential integrity, null
  * rates, value ranges. One row per constraint with violation counts; a
  * generalization of the reference's fail-fast cell check (R2,
  * syncquill.py:67-74) from "any empty cell" to declarative constraints.
  *
  * Each check is a single aggregate or anti-join — no driver loops; at
  * scale the checks share the table scans via one pass per table.
  */
object DataQuality {

  def checks(spark: SparkSession, orders: DataFrame, lineitem: DataFrame,
             customer: DataFrame): DataFrame = {
    import spark.implicits._

    val uniq = orders.agg(
      (count(col("o_orderkey")) - countDistinct(col("o_orderkey"))).as("v"),
      count(lit(1)).as("n"))
      .select(lit("orders.o_orderkey unique").as("constraint"), col("v"), col("n"))

    val fk = lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n")))
      .select(lit("lineitem.l_orderkey -> orders.o_orderkey").as("constraint"), col("v"), col("n"))

    val nulls = customer.agg(
      sum(col("c_name").isNull.cast("long")).as("v"), count(lit(1)).as("n"))
      .select(lit("customer.c_name not null").as("constraint"), col("v"), col("n"))

    val range = lineitem.agg(
      sum((col("l_quantity") < 0 || col("l_quantity") > 100).cast("long")).as("v"),
      count(lit(1)).as("n"))
      .select(lit("lineitem.l_quantity in [0,100]").as("constraint"), col("v"), col("n"))

    uniq.unionByName(fk).unionByName(nulls).unionByName(range)
      .select(col("constraint"), col("v").cast("long").as("n_violations"),
        col("n").cast("long").as("n_checked"),
        (col("v") === 0).cast("long").as("passed"))
      .orderBy("constraint")
  }

  /** Robust (MAD) outlier summary: per segment, the median, the median
    * absolute deviation, and how many balances sit beyond k·MAD — the
    * robust-statistics twin of [[outlierZscore]] (a handful of extreme
    * values corrupt mean/stddev and hide themselves; the median/MAD pair
    * is immune to exactly that). Two broadcast-back passes, the same
    * never-reshuffle-the-fact shape as the z-score scan. Cross-engine
    * determinism: each percentile result is rfloor'd to cents BEFORE it
    * feeds arithmetic, so every downstream double op runs on bit-identical
    * inputs in both engines. At 100 TB the exact medians become
    * approx-percentile sketches (agg_approx_quantiles is the gated
    * bounded-state path). */
  /** RULES-AS-DATA AUDIT (r8) — the Deequ/Great-Expectations shape:
    * the rule set is a FRAME (column, op, bound), not code, so ops
    * teams add checks without a deploy. The audited columns unpivot
    * once (`stack` — one scan however many rules), the rule table
    * broadcasts onto the long frame, violations are conditional
    * counts; the exchange carries |rules| partial groups per task, no
    * matter the fact size. Bounds are chosen so the fixture exercises
    * both outcomes — passing rules AND firing rules — or the audit
    * gate itself would be untested. */
  def rulesAudit(lineitem: DataFrame): DataFrame = {
    val rules = lineitem.sparkSession.createDataFrame(Seq(
      ("l_quantity", "min", 5.0), ("l_quantity", "max", 50.0),
      ("l_discount", "max", 0.08), ("l_tax", "min", 0.0),
      ("l_extendedprice", "min", 1000.0)
    )).toDF("col_name", "op", "bound")
    val long = lineitem.select(expr(
      """stack(4,
        | 'l_quantity', CAST(l_quantity AS DOUBLE),
        | 'l_discount', CAST(l_discount AS DOUBLE),
        | 'l_tax', CAST(l_tax AS DOUBLE),
        | 'l_extendedprice', CAST(l_extendedprice AS DOUBLE)) AS (col_name, v)""".stripMargin))
    val violated = (col("op") === "min" && col("v") < col("bound")) ||
      (col("op") === "max" && col("v") > col("bound"))
    long.join(broadcast(rules), "col_name")
      .groupBy("col_name", "op", "bound")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(violated, 1L).otherwise(0L)).as("n_violations"))
      .withColumn("pass", (col("n_violations") === 0).cast("int"))
      .orderBy("col_name", "op")
  }

  def outlierMad(customer: DataFrame, k: Double = 3.0): DataFrame = {
    val med = customer.groupBy(col("c_mktsegment"))
      .agg(Det.rfloor(expr("percentile(c_acctbal, 0.5)"), 2).as("med"))
    val dev = customer.join(broadcast(med), "c_mktsegment")
      .withColumn("adev", abs(col("c_acctbal") - col("med")))
    val mad = dev.groupBy(col("c_mktsegment"))
      .agg(Det.rfloor(expr("percentile(adev, 0.5)"), 2).as("mad"))
    dev.join(broadcast(mad), "c_mktsegment")
      .groupBy(col("c_mktsegment"))
      .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        count_if(col("adev") > lit(k) * col("mad")).cast("long").as("n_outliers"))
      .orderBy("c_mktsegment")
  }

  /** Per-group z-score outlier report: the most extreme values of
    * l_extendedprice relative to their l_returnflag group's mean/stddev.
    * The two-pass shape is the canonical scalable anomaly scan: pass 1
    * computes per-group moments (EXACT decimal sums, so the derived
    * mean/std are bit-identical across engines and shuffle orders), the
    * tiny stats table is then BROADCAST back onto the fact scan — the data
    * itself is never reshuffled. Both engines compute
    * z = (x - sx/n) / sqrt((sxx - sx·sx/n)/(n-1)) in the same IEEE op
    * order, so ordering by |z| is deterministic; output z is rfloor'd. */
  def outlierZscore(lineitem: DataFrame, topN: Int = 50): DataFrame = {
    // ×100-scaled integer moments (r12): the raw sxx crossed the
    // fractional-decimal→double double-rounding bound (7.4e18 unscaled
    // at sf0.1); z is invariant under the common scaling of x, mean and
    // std, with the row side lifted by one identical ×100.0 double op
    val x = (col("l_extendedprice").cast("decimal(18,2)") * lit(100)).cast("decimal(14,0)")
    val stats = lineitem.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(x).cast("double").as("sx"),
      sum(x * x).cast("double").as("sxx"))
    val nD = col("n").cast("double")
    val mean = col("sx") / nD
    val std = sqrt((col("sxx") - col("sx") * col("sx") / nD) / (nD - lit(1.0)))
    val st = stats.select(col("l_returnflag"), mean.as("mean"), std.as("std"))
    lineitem.join(broadcast(st), "l_returnflag")
      .withColumn("z", (col("l_extendedprice") * lit(100.0) - col("mean")) / col("std"))
      .orderBy(abs(col("z")).desc, col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
      .limit(topN)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_extendedprice"), Det.rfloor(col("z"), 4).as("z"))
  }

  /** ANALYZE-style column profile: per monitored column, non-null count,
    * exact distinct count, and min/max (stringified through fixed-scale
    * decimal / DATE casts so the rendering is engine-identical). One
    * pass over the table; the exact multi-column distinct plans as one
    * Expand + two-phase aggregate — the bounded-memory path at 100 TB is
    * approx_count_distinct (see agg_approx_distinct). Long-form output:
    * one row per column, the shape a catalog stats store ingests. */
  def profile(lineitem: DataFrame): DataFrame = {
    val a = lineitem.agg(
      count(col("l_quantity")).as("qty_n"),
      countDistinct(col("l_quantity")).as("qty_d"),
      min(col("l_quantity")).cast("decimal(18,2)").cast("string").as("qty_min"),
      max(col("l_quantity")).cast("decimal(18,2)").cast("string").as("qty_max"),
      count(col("l_extendedprice")).as("price_n"),
      countDistinct(col("l_extendedprice")).as("price_d"),
      min(col("l_extendedprice")).cast("decimal(18,2)").cast("string").as("price_min"),
      max(col("l_extendedprice")).cast("decimal(18,2)").cast("string").as("price_max"),
      count(col("l_returnflag")).as("flag_n"),
      countDistinct(col("l_returnflag")).as("flag_d"),
      min(col("l_returnflag")).as("flag_min"),
      max(col("l_returnflag")).as("flag_max"),
      count(col("l_shipdate")).as("ship_n"),
      countDistinct(col("l_shipdate")).as("ship_d"),
      min(col("l_shipdate")).cast("date").cast("string").as("ship_min"),
      max(col("l_shipdate")).cast("date").cast("string").as("ship_max"))
    def row(tag: String, p: String) = struct(
      lit(tag).as("column"), col(s"${p}_n").as("n_nonnull"),
      col(s"${p}_d").as("n_distinct"), col(s"${p}_min").as("min_s"),
      col(s"${p}_max").as("max_s"))
    a.select(explode(array(
        row("l_extendedprice", "price"), row("l_quantity", "qty"),
        row("l_returnflag", "flag"), row("l_shipdate", "ship"))).as("r"))
      .select("r.column", "r.n_nonnull", "r.n_distinct", "r.min_s", "r.max_s")
      .orderBy("column")
  }

  /** Distribution drift between two snapshots: total-variation distance
    * ½·Σ|p_i − q_i| per monitored column — the alert a sync pipeline
    * raises when an upstream change shifts the DATA, not just individual
    * cells (diff says what changed; drift says whether the population
    * moved). TVD over cross-multiplied EXACT integer counts:
    * Σ|oc·tn − nc·to| stays integral (decimal(38,0), no overflow) and
    * ONE final double division makes the score engine-exact — a Σ of
    * per-bin double ratios would be summation-order dependent. Shuffles:
    * one count-shuffle per side per column (bins are bounded), totals
    * ride a broadcast. */
  def snapshotDrift(old: DataFrame, neu: DataFrame): DataFrame = {
    def tvdOf(tag: String, bin: org.apache.spark.sql.Column): DataFrame = {
      val o = old.select(bin.as("bin")).groupBy("bin").agg(count(lit(1)).as("oc"))
      val n = neu.select(bin.as("bin")).groupBy("bin").agg(count(lit(1)).as("nc"))
      val j = o.join(n, Seq("bin"), "full_outer")
        .select(coalesce(col("oc"), lit(0L)).as("oc"), coalesce(col("nc"), lit(0L)).as("nc"))
      val t = j.agg(sum(col("oc")).as("t_o"), sum(col("nc")).as("t_n"))
      j.crossJoin(broadcast(t))
        .groupBy(col("t_o"), col("t_n"))
        .agg(
          count(lit(1)).as("n_bins"),
          (sum(abs(col("oc").cast("decimal(19,0)") * col("t_n").cast("decimal(19,0)") -
              col("nc").cast("decimal(19,0)") * col("t_o").cast("decimal(19,0)"))).cast("double") /
            (col("t_o").cast("double") * col("t_n").cast("double")) * 0.5).as("tvd"))
        .select(lit(tag).as("column"), col("n_bins"), col("tvd"))
    }
    val balBin = floor(col("acctbal").cast("double") / 1000).cast("long").cast("string")
    tvdOf("acctbal_1k", balBin)
      .unionByName(tvdOf("segment", col("segment")))
      .orderBy("column")
  }

  /** POPULATION STABILITY INDEX drift between two order snapshots, per
    * histogram bucket — the production monitoring complement of
    * [[snapshotDrift]]'s whole-column TVD: PSI's per-bucket
    * contributions say WHICH part of the distribution moved (the
    * actionable signal — "the $40-50k band doubled"), and because the
    * buckets are the quantile tier's fixed boundaries
    * ([[Aggregates.centsBucket]] — shared, so monitoring and serving
    * can never drift onto different bins), both sides reduce to the
    * same bounded histograms the percentile tier already maintains: at
    * 100 TB this op can run ENTIRELY on two stored epoch histograms
    * without touching a fact row.
    *
    * Determinism: smoothed shares p = (c+1)/(n+1024) with a FIXED
    * additive constant (a bucket-count-dependent smoothing would make
    * the score depend on which empty buckets happen to materialize);
    * the transcendental contribution (pn−po)·ln(pn/po) rounds ONCE per
    * bucket into integer nano-nats (the dsir micro-nat discipline —
    * one rounding site, identical expression on both engines). */
  def driftPsi(oldOrders: DataFrame, newOrders: DataFrame,
               widthCents: Long = 100000L): DataFrame =
    driftPsiFromHists(
      Aggregates.centsHist(oldOrders, widthCents),
      Aggregates.centsHist(newOrders, widthCents))

  /** [[driftPsi]] from two already-reduced (bucket, c) histograms — the
    * form that makes the 100 TB claim literal: pass two
    * [[Aggregates.ensureQuantileHist]] epoch tables and the monitor
    * never touches a fact row (spec-pinned equal to the recompute
    * form; counts are integers so the equality is exact). */
  def driftPsiFromHists(oldHist: DataFrame, newHist: DataFrame): DataFrame = {
    val ho = oldHist.withColumnRenamed("c", "c_old")
    val hn = newHist.withColumnRenamed("c", "c_new")
    // lazy checkpoint: j feeds BOTH the totals and the output — without
    // it each consumer re-executes the two fact scans (the census
    // showed 4 scans for a 2-snapshot op)
    val j = ho.join(hn, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
      .localCheckpoint(eager = false)
    val tot = j.agg(sum(col("c_old")).as("n_old"), sum(col("c_new")).as("n_new"))
    val po = (col("c_old") + lit(1.0)) / (col("n_old") + lit(1024.0))
    val pn = (col("c_new") + lit(1.0)) / (col("n_new") + lit(1024.0))
    j.crossJoin(broadcast(tot))
      .select(col("bucket"), col("c_old"), col("c_new"),
        round((pn - po) * log(pn / po) * lit(1e9), 0).cast("bigint").as("psi_units"))
      .orderBy("bucket")
  }

  /** Two-sample KOLMOGOROV–SMIRNOV drift statistic between order
    * snapshots over the shared histogram boundaries — the third drift
    * lens beside [[snapshotDrift]]'s TVD (total mass moved) and
    * [[driftPsi]]'s per-bucket attribution: KS is the LARGEST gap
    * between the two cumulative distributions, the statistic that
    * catches a location/scale shift even when per-bucket masses barely
    * move. Exactness: D is computed entirely in integers by
    * cross-multiplication — D_num = max|cum_old·n_new − cum_new·n_old|
    * over bucket boundaries, carried in DECIMAL(38,0) (cum·n can reach
    * ~10¹⁸·10⁹) — and divided ONCE at the end for the reported double;
    * no per-bucket floating point at all, so the oracle equality is
    * exact, not rounded. Output: one row — D (rounded), the arg-max
    * boundary bucket, and both sample sizes. The cumulative is the
    * bounded-frame triangular join, the [[Aggregates.quantileRollup]]
    * discipline. */
  def driftKs(oldOrders: DataFrame, newOrders: DataFrame,
              widthCents: Long = 100000L): DataFrame =
    driftKsFromHists(
      Aggregates.centsHist(oldOrders, widthCents),
      Aggregates.centsHist(newOrders, widthCents))

  /** [[driftKs]] from two already-reduced (bucket, c) histograms — the
    * stored-epoch entry point shared with [[driftPsiFromHists]]: pass
    * two [[Aggregates.ensureQuantileHist]] epoch tables and the monitor
    * never touches a fact row. Counts are integers and D's numerator is
    * exact integer cross-multiplication, so the equality with the
    * recompute form is EXACT (spec-pinned), completing the drift
    * family's epoch symmetry — TVD/PSI/KS all run off the same stored
    * histogram artifacts at 100 TB. */
  def driftKsFromHists(oldHist: DataFrame, newHist: DataFrame): DataFrame = {
    val ho = oldHist.withColumnRenamed("c", "c_old")
    val hn = newHist.withColumnRenamed("c", "c_new")
    val j = ho.join(hn, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
      .localCheckpoint(eager = false)
    val tot = j.agg(sum(col("c_old")).as("n_old"), sum(col("c_new")).as("n_new"))
    val cum = j.as("a")
      .join(j.as("b"), col("b.bucket") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("b.c_old")).as("cum_old"), sum(col("b.c_new")).as("cum_new"))
    val gap = (col("cum_old").cast("decimal(38,0)") * col("n_new").cast("decimal(38,0)")
      - col("cum_new").cast("decimal(38,0)") * col("n_old").cast("decimal(38,0)"))
    val gaps = cum.crossJoin(broadcast(tot))
      .select(col("bucket"), abs(gap).as("gap"), col("n_old"), col("n_new"))
      .localCheckpoint(eager = false)
    val dmax = gaps.groupBy(col("n_old"), col("n_new")).agg(max(col("gap")).as("d_num"))
    // arg-max boundary, deterministic tie-break to the smallest bucket
    dmax.join(gaps.select(col("bucket"), col("gap")), col("gap") === col("d_num"))
      .groupBy(col("n_old"), col("n_new"), col("d_num"))
      .agg(min(col("bucket")).as("at_bucket"))
      .select(
        (floor(col("d_num").cast("double")
          / (col("n_old").cast("double") * col("n_new").cast("double")) * 1e6 + 0.5) / 1e6).as("ks_d"),
        col("at_bucket"), col("n_old"), col("n_new"))
  }

  /** BENFORD first-significant-digit profile of a monetary column —
    * the classic fabricated-data screen (organic multiplicative values
    * follow P(d) = log10(1 + 1/d); synthesized or tampered columns
    * don't, and the per-digit deviation is the audit signal). The
    * digit extraction is INTEGER-only — d = v div 10^(len(str(v))−1)
    * on the floored value — because floor(log10(x)) on doubles can
    * misround at exact powers of ten and CAST(double AS BIGINT)
    * truncates in Spark but rounds in DuckDB; string length of an
    * integer is portable everywhere. One map-side digit pass + a
    * 9-row aggregate; the total rides along as a broadcast scalar. */
  def benford(lineitem: DataFrame): DataFrame = {
    val base = lineitem.filter(col("l_extendedprice") >= 1.0)
      .select(floor(col("l_extendedprice")).cast("long").as("v"))
      .withColumn("d",
        expr("v div cast(pow(10, length(cast(v as string)) - 1) as bigint)"))
    val total = base.agg(count(lit(1)).as("n_tot"))
    base.groupBy("d").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("d").as("digit"), col("n"),
        (round(col("n") / col("n_tot"), 4) + lit(0.0)).as("share"),
        (round(log(10.0, lit(1.0) + lit(1.0) / col("d")), 4) + lit(0.0)).as("benford"))
      .withColumn("dev", round(col("share") - col("benford"), 4) + lit(0.0))
      .orderBy("digit")
  }

  /** Train/eval contamination check: the same text content appearing
    * under MORE THAN ONE source — the leak a training pipeline must
    * catch before a source split becomes a train/test split. Group by a
    * content digest (md5 — one shuffle of (digest, source), never the
    * text bodies) and keep digests spanning ≥2 distinct sources. The
    * synthetic corpus is cross-source-clean, so deterministic mirror
    * copies are injected (same derivation in the oracle SQL). */
  def contamination(documents: DataFrame): DataFrame = {
    val mirrored = documents.filter(col("doc_id") % 9 === 0)
      .withColumn("doc_id", col("doc_id") + 300000)
      .withColumn("source", lit("crawl_mirror"))
    documents.unionByName(mirrored)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_sources") >= 2)
      .orderBy("text_md5")
  }

  /** Referential-integrity audit across the star schema's FK edges.
    *
    * One row per edge with child rows / orphan rows / distinct orphan
    * keys. The fixture simulates late-arriving dimensions: each large
    * parent drops keys ≡ 0 (mod 97) — a deterministic partial snapshot
    * — so the orphan counts are real, not structurally zero; the
    * nation→region edge stays intact as the all-green control row.
    *
    * Each edge is one left outer join + conditional-count aggregate
    * (a single pass — not a count job plus an anti-join job). Parent
    * key sets project to the key column only; small dims broadcast on
    * size, the orders-sized parent takes the ordinary shuffled
    * equi-join — at 100 TB that edge is the one real shuffle, keyed
    * uniformly, and the five frames union as independent stages. */
  def referentialIntegrity(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
                           supplier: DataFrame, customer: DataFrame,
                           nation: DataFrame, region: DataFrame): DataFrame = {
    def edge(name: String, child: DataFrame, key: String,
             parent: DataFrame, pkey: String, dropMod: Option[Int]): DataFrame = {
      val pk = dropMod.fold(parent)(m => parent.filter(col(pkey) % m =!= 0))
        .select(col(pkey).as("__pk")).distinct()
      child.select(col(key).as("__ck"))
        .join(pk, col("__ck") === col("__pk"), "left")
        .agg(count(lit(1)).as("child_rows"),
          count(when(col("__pk").isNull, lit(1))).as("orphan_rows"),
          countDistinct(when(col("__pk").isNull, col("__ck"))).as("orphan_keys"))
        .select(lit(name).as("edge"), col("child_rows"),
          col("orphan_rows"), col("orphan_keys"))
    }
    edge("lineitem.orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey", Some(97))
      .unionByName(edge("lineitem.partkey->part", lineitem, "l_partkey", part, "p_partkey", Some(97)))
      .unionByName(edge("lineitem.suppkey->supplier", lineitem, "l_suppkey", supplier, "s_suppkey", Some(13)))
      .unionByName(edge("orders.custkey->customer", orders, "o_custkey", customer, "c_custkey", Some(97)))
      .unionByName(edge("nation.regionkey->region", nation, "n_regionkey", region, "r_regionkey", None))
      .orderBy("edge")
  }

  /** KEY-CONTINUITY AUDIT by fixed-width bucket (r8) — the "did the
    * extract drop a range" check: per bucket `[b·W, (b+1)·W)` of the
    * key domain, how many keys exist, how many are missing INSIDE the
    * observed span, how many maximal missing runs interrupt it, and
    * the missing spans at the bucket's leading/trailing edges.
    *
    * The naive gap report (`lead(k) OVER (ORDER BY k)`) is a global
    * total order — diff_positional's scale liability. Fixed-width
    * buckets make the audit fully partition-parallel with NO neighbor
    * lookup at all: a bucket's edge spans are computable from its own
    * min/max against its own domain edges (`first − b·W` missing
    * before, `(b+1)·W − 1 − last` after), a boundary gap spanning
    * empty buckets is simply those buckets' absence plus the edge
    * spans of the buckets around it, and the internal missing count
    * is pure arithmetic (`span − n_keys`). Only the RUN count needs a
    * window — partitioned by bucket. One distinct + one aggregate;
    * output is bucket-grain. */
  def sequentialGaps(orders: DataFrame, width: Long = 32L): DataFrame = {
    val keys = orders.select(col("o_orderkey").as("k")).distinct()
      .withColumn("b", expr(s"k div $width"))
    val w = Window.partitionBy("b").orderBy("k")
    val runStart = when(lag(col("k"), 1).over(w).isNull ||
      lag(col("k"), 1).over(w) < col("k") - 1, 1L).otherwise(0L)
    keys.withColumn("rs", runStart)
      .groupBy("b")
      .agg(min(col("k")).as("first_key"), max(col("k")).as("last_key"),
        count(lit(1)).as("n_keys"),
        (sum(col("rs")) - 1).as("gap_runs"))
      .select(col("b").as("bucket"), col("first_key"), col("last_key"),
        col("n_keys"),
        (col("last_key") - col("first_key") + 1 - col("n_keys")).as("missing_internal"),
        col("gap_runs"),
        (col("first_key") - col("b") * width).as("lead_missing"),
        ((col("b") + 1) * width - 1 - col("last_key")).as("trail_missing"))
      .orderBy("bucket")
  }

  /** INGEST FRESHNESS AUDIT (r9) — per (event_type, ingest shard), how
    * far behind the freshest data in the corpus that slice's newest
    * event sits. The audit every multi-shard ingest runs before
    * advancing a watermark or publishing a snapshot: one stuck shard
    * holds the GLOBAL watermark back ([[graft.streaming.Streams]]
    * late-events semantics), and this table names it. The reference
    * point is the corpus max event time, NOT wall clock — deterministic
    * and replayable (an audit keyed to now() can never be re-verified).
    *
    * Shards are synthesized as `user_id % nShards` (the fixture has no
    * shard column; a real ingest passes its own). Output per slice:
    * event count, last-seen epoch second, minutes behind the corpus
    * max (exact integer floor division — no float), and the staleness
    * bucket an alerting rule keys on (fresh < 6 h, lagging < 24 h,
    * stale beyond).
    *
    * Plan: one map-side-combining aggregate to the (type × shard) grain
    * — the exchange carries nShards·|types| partial rows, never events —
    * then the corpus max joins back as a broadcast 1-row scalar (the
    * allowed BNLJ-1-row class). At 100 TB this is a map-mostly scan
    * whose output is alert-table sized. */
  def freshness(events: DataFrame, nShards: Int = 20): DataFrame = {
    val perSlice = events
      .groupBy(col("event_type"), (col("user_id") % nShards).as("shard"))
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("max_us"))
    val global = perSlice.agg(max(col("max_us")).as("g_us"))
    perSlice.crossJoin(broadcast(global))
      .select(col("event_type"), col("shard"), col("n_events"),
        // FLOOR division, not `div` (truncate-toward-zero): the oracle's
        // `//` floors, and max_us is raw epoch-µs — a pre-1970 event is
        // negative and truncation would diverge. `a - pmod(a,b)` is the
        // largest multiple of b ≤ a, all-integer, exact for any sign.
        expr("(max_us - pmod(max_us, 1000000)) div 1000000").as("last_seen_s"),
        // lag is max-relative, provably ≥ 0: here div == floor.
        expr("(g_us - max_us) div 60000000").as("lag_min"))
      .withColumn("staleness",
        when(col("lag_min") < 360, "fresh")
          .when(col("lag_min") < 1440, "lagging")
          .otherwise("stale"))
      .orderBy("event_type", "shard")
  }
}
