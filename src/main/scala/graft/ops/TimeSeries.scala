package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the event stream at day grain: gap
  * interpolation, rolling anomaly scoring, and exponential smoothing.
  *
  * The reference's analytics surface stops at snapshot diffing; a
  * monitoring pipeline over the same tables needs the time dimension
  * treated as a first-class axis — dense spines, dropout repair, and
  * trailing-window scores. Everything here follows the repo's
  * determinism doctrine: daily values are exact integer cents (the
  * `win_range_frame` idiom), window aggregates sum integers (exact at
  * any parallelism), and the only floating-point steps are final
  * formula arithmetic on exact sums, identical ASTs on both engines,
  * rounded via [[Det.rfloor]].
  *
  * Scale shape (100 TB): the day-grain aggregate is the only
  * data-sized shuffle — (type, day) keys with map-side partials. Every
  * window below it runs on the day-grain frame, whose cardinality is
  * series × days, independent of event volume. At production grain the
  * partition key would be (entity, metric) with millions of short
  * series — the same plan, just wider hash partitioning; no window
  * ever spans more than one series.
  */
object TimeSeries {

  /** Exact per-(type, day) totals: value lifted to integer cents
    * per row (`CAST(CAST(value*100 AS DECIMAL(18,0)) AS BIGINT)`),
    * summed as BIGINT — order-independent, engine-exact. */
  private def dailyCents(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") * 100).cast("decimal(18,0)").cast("bigint")).as("cents"))

  /** Linear gap interpolation over a dense daily spine.
    *
    * Sensor-dropout repair: the observed series is the daily totals
    * with a deterministic dropout (days ≡ 1,2 mod 4 removed — two-day
    * holes, including a leading edge hole on days 1-2). The spine is
    * types × [min..max] day; missing days get the linear interpolation
    * between the nearest observed neighbors; days before the first /
    * after the last observation stay null and are tagged `edge`.
    *
    * The carried values are BIGINT cents, so `prev + (next-prev)·pos/len`
    * is double arithmetic on exact integers — one shared AST with the
    * oracle. The spine bounds come from a 1-row aggregate cross-joined
    * in (model-params-sized, like the IVF centroid collect), never a
    * driver-side date literal, so the operator ports to any window of
    * data unchanged. */
  def interpolateLinear(events: DataFrame): DataFrame = {
    val daily = dailyCents(events)
    val observed = daily.filter(dayofmonth(col("day")) % 4 === 0 ||
      dayofmonth(col("day")) % 4 === 3)
    val bounds = daily.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("day"))
    val wp = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("cents").isNotNull, col("day"))
    val base = spine.join(observed.drop("n"), Seq("event_type", "day"), "left")
      .withColumn("prev_cents", last(col("cents"), ignoreNulls = true).over(wp))
      .withColumn("prev_day", last(obsDay, ignoreNulls = true).over(wp))
      .withColumn("next_cents", first(col("cents"), ignoreNulls = true).over(wn))
      .withColumn("next_day", first(obsDay, ignoreNulls = true).over(wn))
    val interp = col("prev_cents").cast("double") +
      (col("next_cents").cast("double") - col("prev_cents").cast("double")) *
        datediff(col("day"), col("prev_day")).cast("double") /
        datediff(col("next_day"), col("prev_day")).cast("double")
    val filled = when(col("cents").isNotNull, col("cents").cast("double"))
      .when(col("prev_cents").isNotNull && col("next_cents").isNotNull, interp)
    base.select(col("event_type"), col("day"),
        when(col("cents").isNotNull, lit("obs"))
          .when(col("prev_cents").isNotNull && col("next_cents").isNotNull, lit("interp"))
          .otherwise(lit("edge")).as("src"),
        Det.rfloor(filled / 100, 4).as("value_filled"))
      .orderBy("event_type", "day")
  }

  /** Trailing 7-day rolling z-score anomaly flag per series.
    *
    * Window sums are over BIGINT cents and cents² — exact; mean/std/z
    * are the sample-std formula in double on those exact sums (std via
    * `sqrt`, which is correctly-rounded IEEE on both engines — never
    * `pow`). z is null while the window has <2 points or zero
    * variance; the anomaly flag is |z| > 2 on the UNROUNDED z. */
  def rollingAnomaly(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    val nw = count(lit(1)).over(w).cast("double")
    val sx = sum(col("cents")).over(w).cast("double")
    val sxx = sum(col("cents") * col("cents")).over(w).cast("double")
    dailyCents(events)
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("mean_c", sx / nw)
      .withColumn("std_c",
        when(nw > 1, sqrt((sxx - sx * sx / nw) / (nw - lit(1.0)))))
      .withColumn("z",
        when(col("std_c") > 0,
          (col("cents").cast("double") - col("mean_c")) / col("std_c")))
      .select(col("event_type"), col("day"), col("cents"), col("n_win"),
        Det.rfloor(col("mean_c") / 100, 4).as("mean_value"),
        Det.rfloor(col("z"), 4).as("z"),
        // emitted as 0/1 BIGINT, not boolean — sidesteps engine-specific
        // boolean stringification in the hash compare
        (col("z").isNotNull && abs(col("z")) > 2).cast("long").as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Trailing 7-day ROLLING MEDIAN per series (r8) — the robust twin
    * of [[rollingAnomaly]]'s mean/std: one wild day shifts a rolling
    * mean for a week but leaves the rolling median untouched, so the
    * spike flag survives contaminated baselines. The window collects
    * ≤ 7 integer-cents values, sorts, and takes the exact middle
    * (even windows average the two middles — exact halves on integer
    * cents, bit-stable in double); the spike flag compares integers
    * (cents > 2·median ⇔ cents·2 > a+b scaled), no float threshold.
    *
    * Scale: same day-grain story as every ts_ operator — the only
    * data-sized shuffle is the daily aggregate; the 7-element window
    * array is O(1) per row on the series × days frame. */
  def rollingMedian(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-6, Window.currentRow)
    val nw = col("nw")
    dailyCents(events)
      .withColumn("arr", sort_array(collect_list(col("cents")).over(w)))
      .withColumn("nw", size(col("arr")).cast("long"))
      .withColumn("med_c",
        when(nw % 2 === 1,
          element_at(col("arr"), ((nw + 1) / lit(2L)).cast("int")).cast("double"))
        .otherwise((element_at(col("arr"), (nw / lit(2L)).cast("int"))
            + element_at(col("arr"), (nw / lit(2L) + 1).cast("int")))
          .cast("double") / 2.0))
      .select(col("event_type"), col("day"), col("cents"), nw.as("n_win"),
        Det.rfloor(col("med_c") / 100, 4).as("median_value"),
        (col("cents").cast("double") > col("med_c") * 2.0).cast("long")
          .as("is_spike"))
      .orderBy("event_type", "day")
  }

  /** LTTB DOWNSAMPLING per series (r8) — Largest-Triangle-Three-Buckets
    * (Steinarsson 2013), the dashboard renderer's operator: reduce a
    * series to `buckets` points that preserve visual shape (peaks and
    * valleys survive; uniform striding would erase them). This is the
    * PARALLEL-ANCHOR variant: the classic algorithm anchors each
    * bucket's triangle on the PREVIOUSLY SELECTED point (a sequential
    * chain), here anchors are the neighboring buckets' mean points —
    * every bucket selects independently, so the operator is one
    * map-side argmax instead of an n-step recursion; first/last points
    * are always kept, interior points split evenly into buckets by
    * rank.
    *
    * Determinism: the triangle-area argmax is computed on EXACT
    * integers — anchor means are rationals sum/cnt, so the cross
    * product is scaled by dA²·dC (the common denominator): area ∝
    * |(cxn·dA − axn·dC)(py·dA − ayn) − (cyn·dA − ayn·dC)(px·dA − axn)|,
    * all BIGINT factors, DECIMAL(38,0) products — no float enters the
    * comparison; ties → earliest day.
    *
    * Overflow discipline (r9 ADVICE): x is the day offset from the
    * SERIES' OWN first day, not the epoch — the argmax is translation-
    * invariant in x (every factor is a difference of x-terms with
    * matching counts), so the result is identical while the x-factor
    * magnitudes shrink from epoch-days (~2·10⁴ multiplying every term)
    * to the series' span. decimal(19,0)·decimal(19,0) declares a
    * decimal(38,0) product (39 digits capped at 38): a true product
    * ≥ 10³⁸ nulls out under non-ANSI mode and a silent null here would
    * DROP that candidate from the argmax — so the area wraps in a
    * raise_error sentinel and the operator fails loudly instead. The
    * bound is generous: it needs bucket-count³·span·cents ≳ 2.5·10³⁷
    * to trip (e.g. 10⁶ points/bucket × 10⁵-day span × $10¹¹ daily
    * cents stays 100× under it).
    *
    * Scale: the day-grain aggregate is the only data-sized shuffle;
    * bucket means are a bucket-count frame broadcast back onto the
    * series × days frame; the argmax is a per-bucket rank-1 filter. */
  def downsampleLttb(events: DataFrame, buckets: Int = 12): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val wa = Window.partitionBy("event_type")
    val nb = buckets - 2
    require(nb >= 1, "need at least 3 buckets")
    // x rides the SAME partition-only window as n (adjacent wa-spec
    // windows collapse into one Window node — keeping the r8 plan shape)
    val base = dailyCents(events)
      .withColumn("t", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wa))
      .withColumn("x", datediff(col("day"), min(col("day")).over(wa)).cast("long"))
    val interior = base.filter(col("t") > 1 && col("t") < col("n"))
      .withColumn("b", expr(s"((t - 2) * $nb) div (n - 2)"))
    val bagg = interior.groupBy("event_type", "b")
      .agg(sum(col("x")).as("sx"), sum(col("cents")).as("sy"),
        count(lit(1)).as("cnt"))
    val firsts = base.filter(col("t") === 1)
      .select(col("event_type"), col("x").as("fx"), col("cents").as("fy"),
        col("day").as("fday"))
    val lasts = base.filter(col("t") === col("n") && col("n") > 1)
      .select(col("event_type"), col("x").as("lx"), col("cents").as("ly"),
        col("day").as("lday"))
    val wb = Window.partitionBy("event_type").orderBy("b")
    // anchors: A = previous non-empty bucket's mean (or the first
    // point), C = next non-empty bucket's mean (or the last point) —
    // rationals carried as (numerator, denominator)
    val anchors = bagg
      .join(firsts.drop("fday"), "event_type").join(lasts.drop("lday"), "event_type")
      .select(col("event_type"), col("b"),
        coalesce(lag(col("sx"), 1).over(wb), col("fx")).as("axn"),
        coalesce(lag(col("sy"), 1).over(wb), col("fy")).as("ayn"),
        coalesce(lag(col("cnt"), 1).over(wb), lit(1L)).as("da"),
        coalesce(lead(col("sx"), 1).over(wb), col("lx")).as("cxn"),
        coalesce(lead(col("sy"), 1).over(wb), col("ly")).as("cyn"),
        coalesce(lead(col("cnt"), 1).over(wb), lit(1L)).as("dc"))
    val d19 = "decimal(19,0)"
    val rawA2 = abs(
      (col("cxn") * col("da") - col("axn") * col("dc")).cast(d19)
        * (col("cents") * col("da") - col("ayn")).cast(d19)
      - (col("cyn") * col("da") - col("ayn") * col("dc")).cast(d19)
        * (col("x") * col("da") - col("axn")).cast(d19))
    val scored = interior.join(broadcast(anchors), Seq("event_type", "b"))
      // a null here is decimal(38,0) overflow, never a null input (the
      // day-grain aggregate and the anchor coalesces are total): fail
      // loudly, a silently dropped argmax candidate is a wrong answer
      .withColumn("a2", when(rawA2.isNotNull, rawA2).otherwise(raise_error(lit(
        "downsampleLttb: decimal(38,0) overflow in the triangle-area cross " +
        "product — series magnitudes exceed the documented bound")).cast("decimal(38,0)")))
      .withColumn("rk", row_number().over(Window.partitionBy("event_type", "b")
        .orderBy(col("a2").desc, col("day").asc)))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day"), col("cents"), lit("bucket").as("role"))
    firsts.select(col("event_type"), col("fday").as("day"), col("fy").as("cents"),
        lit("first").as("role"))
      .unionByName(scored)
      .unionByName(lasts.select(col("event_type"), col("lday").as("day"),
        col("ly").as("cents"), lit("last").as("role")))
      .orderBy("event_type", "day")
  }

  /** STL-style DECOMPOSITION per series (r8) — value = trend + seasonal
    * + residual, the monitoring lens that answers "is today's number a
    * trend move, the usual weekday dip, or a real anomaly". Moving-
    * average flavor: trend = centered 7-day MA (defined only on full
    * windows — edges stay null, the [[interpolateLinear]] edge
    * discipline), seasonal = day-of-week mean of the DETRENDED series,
    * residual = the rest. Exactness: the detrended carrier is
    * 7·x_t − Σwindow (an exact integer — no division until the end),
    * the seasonal sum stays integer, and each output component is ONE
    * double formula on exact sums rounded once — identical ASTs on
    * both engines.
    *
    * Scale: two windows + one (series, dow) aggregate on the day-grain
    * frame; the 7-row-per-series seasonal profile broadcasts back. */
  def stlDecompose(events: DataFrame): DataFrame = {
    val w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    val base = dailyCents(events)
      .withColumn("tw", count(lit(1)).over(w7))
      .withColumn("tsum", sum(col("cents")).over(w7))
      .withColumn("t7", when(col("tw") === 7, col("tsum")))
      .withColumn("d7", when(col("tw") === 7, col("cents") * 7 - col("tsum")))
      .withColumn("dow",
        pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)).cast("long"))
    val seas = base.filter(col("d7").isNotNull)
      .groupBy("event_type", "dow")
      .agg(sum(col("d7")).as("sd7"), count(lit(1)).as("nd"))
    base.join(broadcast(seas), Seq("event_type", "dow"), "left_outer")
      .select(col("event_type"), col("day"),
        Det.rfloor(col("cents").cast("double") / 100, 4).as("value"),
        Det.rfloor(col("t7").cast("double") / 7 / 100, 4).as("trend"),
        Det.rfloor(col("sd7").cast("double")
          / (col("nd") * 7).cast("double") / 100, 4).as("seasonal"),
        Det.rfloor((col("cents").cast("double") - col("t7").cast("double") / 7
          - col("sd7").cast("double") / (col("nd") * 7).cast("double")) / 100, 4)
          .as("resid"))
      .orderBy("event_type", "day")
  }

  /** STL-RESIDUAL ANOMALY FLAGS (r8) — the monitoring op the
    * decomposition exists for: a raw z-score on the series flags every
    * weekend as anomalous on weekly-seasonal data; scoring the STL
    * RESIDUAL (trend and day-of-week effect already removed) flags
    * only what the structure can't explain. Robust scoring — median +
    * MAD per series (the dq_outlier_mad discipline: each percentile
    * rfloor'd BEFORE it feeds arithmetic, so downstream doubles are
    * bit-identical cross-engine; medians are order statistics, no
    * accumulation-order hazard). Edge days (incomplete 7-day trend
    * window) carry null resid and stay null through score and flag on
    * both engines. Scale: the resid frame is day-grain (event-volume-
    * free); two tiny aggregates broadcast back. */
  def anomalyStl(events: DataFrame, k: Double = 3.0): DataFrame = {
    // day-grain and consumed three times (base, med, mad chains) — the
    // lazy checkpoint keeps the FACT scan at one, not eight (census
    // showed the uncheckpointed form re-deriving the decomposition per
    // consumer; at 100 TB the events scan is the whole cost)
    val base = stlDecompose(events)
      .select(col("event_type"), col("day"), col("value"), col("resid"))
      .localCheckpoint(eager = false)
    val med = base.groupBy("event_type")
      .agg(Det.rfloor(expr("percentile(resid, 0.5)"), 4).as("med"))
    val dev = base.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("resid") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(Det.rfloor(expr("percentile(adev, 0.5)"), 4).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("day"), col("value"), col("resid"),
        when(col("mad") > 0,
          Det.rfloor((col("resid") - col("med")) / col("mad"), 4)).as("score"),
        (col("adev") > lit(k) * col("mad")).cast("int").as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** CUSUM changepoint detection per series — the level-shift screen.
    *
    * The classic statistic is max_t |S_t − t·x̄| over the running sums;
    * x̄ = T/n makes it rational, so both sides are scaled by n:
    * D_t = n·S_t − t·T is an EXACT integer (DECIMAL(38,0) products —
    * n·S and t·T individually fit well under 10³⁸ at any realistic
    * per-series day count), and the argmax needs no float compare.
    * The changepoint is the t < n maximizing |D_t| (tie → earliest
    * day); means before/after and the shift are one double division
    * each on exact sums.
    *
    * Scale: three windows over the day-grain frame (series × days
    * cardinality, event-volume-free), all on ONE event_type hash
    * partitioning; the argmax is a rank-1 filter, never a collect. */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    val dec = "decimal(38,0)"
    val scored = dailyCents(events)
      .withColumn("t", row_number().over(w))
      .withColumn("s", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nd", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("cents")).over(wAll))
      .withColumn("d", col("nd").cast(dec) * col("s").cast(dec)
        - col("t").cast(dec) * col("tot").cast(dec))
    val top = scored.filter(col("t") < col("nd"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(abs(col("d")).desc, col("day").asc)))
      .filter(col("rk") === 1)
    val meanBefore = col("s").cast("double") / col("t").cast("double") / 100
    val meanAfter = (col("tot") - col("s")).cast("double") /
      (col("nd") - col("t")).cast("double") / 100
    top.select(col("event_type"), col("day").as("cp_day"),
        col("t").cast("long").as("t_cp"), col("nd").as("n_days"),
        Det.rfloor(meanBefore, 4).as("mean_before"),
        Det.rfloor(meanAfter, 4).as("mean_after"),
        Det.rfloor(meanAfter - meanBefore, 4).as("shift"))
      .orderBy("event_type")
  }

  /** Lag-1..7 autocorrelation per series, exact-integer moment form.
    *
    * The ACF estimator r_k = Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄) / Σ_t(x_t−x̄)²
    * has the rational mean x̄ = T/n inside both sums; scaling every
    * centered term by n (c_t = n·x_t − T) multiplies numerator and
    * denominator by n², which cancels — so both sums are EXACT integer
    * DECIMAL(38,0) sums of BIGINT-times-BIGINT products (c ~ n·x stays
    * ≤ 10¹⁴ for realistic series; c² ≤ 10²⁸ < 10³⁸), and the one
    * double division per lag is the whole floating-point story.
    *
    * Scale: one lag chain + one grouped aggregate over the day-grain
    * frame; the unpivot runs on the series-count-sized result. */
  def autocorr(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    val dec = "decimal(38,0)"
    val base = dailyCents(events)
      .withColumn("nd", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("cents")).over(wAll))
    val withLags = (1 to maxLag).foldLeft(base)((df, k) =>
      df.withColumn(s"lag$k", lag(col("cents"), k).over(w)))
    def c(x: org.apache.spark.sql.Column) =
      col("nd").cast(dec) * x.cast(dec) - col("tot").cast(dec)
    val aggs = Seq(sum(c(col("cents")) * c(col("cents"))).as("den")) ++
      (1 to maxLag).flatMap { k =>
        Seq(
          sum(when(col(s"lag$k").isNotNull, c(col("cents")) * c(col(s"lag$k")))).as(s"num$k"),
          count(col(s"lag$k")).as(s"np$k"))
      }
    val g = withLags.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    val lagRows = (1 to maxLag).map(k => struct(
      lit(k).cast("long").as("lag"), col(s"np$k").as("n_pairs"),
      (col(s"num$k").cast("double") / col("den").cast("double")).as("r")))
    g.select(col("event_type"), explode(array(lagRows: _*)).as("x"))
      .select(col("event_type"), col("x.lag").as("lag"),
        col("x.n_pairs").as("n_pairs"), Det.rfloor(col("x.r"), 6).as("acf"))
      .orderBy("event_type", "lag")
  }

  /** Day-of-week seasonal profile per series.
    *
    * The weekday key is epoch-day mod 7 (0 = Thursday, 1970-01-01) —
    * locale-free and identical on every engine, where named-weekday
    * functions disagree on week start. Seasonal index = dow mean /
    * series mean = c·n / (n_dow·T): integer sums, one double formula.
    *
    * Scale: two aggregates over the day-grain frame; the per-series
    * totals (series-count rows) broadcast back onto the 7-row-per-
    * series profile. */
  def seasonalDow(events: DataFrame): DataFrame = {
    val base = dailyCents(events)
      .withColumn("dow", pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)).cast("long"))
    val g = base.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("c"))
    val t = base.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum(col("cents")).as("tot"))
    g.join(broadcast(t), "event_type")
      .select(col("event_type"), col("dow"), col("n_days"),
        Det.rfloor(col("c").cast("double") / col("n_days").cast("double") / 100, 4)
          .as("mean_value"),
        Det.rfloor(col("c").cast("double") * col("nd").cast("double") /
          (col("n_days").cast("double") * col("tot").cast("double")), 4)
          .as("seasonal_idx"))
      .orderBy("event_type", "dow")
  }

  /** Truncated exponential moving average (α = 1/2, depth 8) per
    * series.
    *
    * The textbook EMA recursion is order-dependent float accumulation —
    * unreproducible across engines. With α = 1/2 the closed form's
    * weights are powers of two, so the 8-term truncation is EXACT
    * integer arithmetic: numerator Σ lagⱼ·2^(7-j) and denominator
    * Σ 2^(7-j) over the lags that exist (early rows renormalize over
    * the shorter window), one double division at the end. Truncation
    * error vs the infinite recursion is ≤ 2⁻⁸ of the oldest mass —
    * documented contract, not an approximation bug: the operator IS
    * "EMA8". A lag chain, not a frame aggregate, so the whole thing is
    * one window pass. */
  def ema8(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val lags = (0 to 7).map { j =>
      val c = if (j == 0) col("cents") else lag(col("cents"), j).over(w)
      (c, 1L << (7 - j))
    }
    val num = lags.map { case (c, wt) => coalesce(c, lit(0L)) * lit(wt) }
      .reduce(_ + _)
    val den = lags.map { case (c, wt) =>
      when(c.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    dailyCents(events)
      .withColumn("ema", Det.rfloor(num.cast("double") / den.cast("double") / 100, 4))
      .select(col("event_type"), col("day"), col("cents"), col("ema"))
      .orderBy("event_type", "day")
  }

  /** SMA CROSSOVER DETECTOR (r9) — the classic trend-shift signal: per
    * series, the days where the short trailing mean (7 rows) crosses
    * the long one (28 rows) — "golden" when the short side comes out on
    * top (demand accelerating), "death" when it drops below (the alert
    * a capacity planner pages on). The edge-of-series frames carry
    * fewer rows, so means are over the ACTUAL frame counts.
    *
    * Determinism: the comparison never touches a float — sma_s > sma_l
    * ⟺ sum_s·cnt_l > sum_l·cnt_s by cross-multiplication on exact
    * integer cents (the `downsampleLttb` discipline applied to a
    * predicate); `margin` emits the exact integer difference. A tie
    * (margin 0) counts as "not above", so the state is total and
    * cross-engine stable.
    *
    * Scale: all four rolling sums share ONE partitioned sort (series ×
    * day grain — calendar-bounded after the daily aggregate, never
    * events); output is crossing-days only. */
  def smaCross(events: DataFrame, shortN: Int = 7, longN: Int = 28): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val ws = w.rowsBetween(-(shortN - 1), 0)
    val wl = w.rowsBetween(-(longN - 1), 0)
    val above = (col("sum_s") * col("cnt_l") > col("sum_l") * col("cnt_s")).cast("int")
    dailyCents(events)
      .withColumn("sum_s", sum(col("cents")).over(ws))
      .withColumn("cnt_s", count(lit(1)).over(ws))
      .withColumn("sum_l", sum(col("cents")).over(wl))
      .withColumn("cnt_l", count(lit(1)).over(wl))
      .withColumn("above", above)
      .withColumn("prev_above", lag(col("above"), 1).over(w))
      .filter(col("prev_above").isNotNull && col("above") =!= col("prev_above"))
      .select(col("event_type"), col("day"),
        when(col("above") === 1, "golden").otherwise("death").as("direction"),
        (col("sum_s") * col("cnt_l") - col("sum_l") * col("cnt_s")).as("margin"))
      .orderBy("event_type", "day")
  }

  /** HOLT'S LINEAR TREND smoothing (r8) — double exponential smoothing
    * with α = β = 1/2: `level_t = ⌊(y_t + level_{t−1} + trend_{t−1})/2⌋`,
    * `trend_t = ⌊(level_t − level_{t−1} + trend_{t−1})/2⌋`, one-step
    * forecast `f_t = level_{t−1} + trend_{t−1}` (null on each series'
    * first day, [[interpolateLinear]]'s edge discipline) — [[ema8]]'s
    * level-only smoothing plus the trend term, the simplest forecast a
    * capacity dashboard runs.
    *
    * Unlike EMA8's truncated closed form, the FULL recursion ships
    * here: the state is integer cents and each step is one
    * floor-halving (exact in IEEE double far below 2⁵³ — deterministic
    * on any engine), so the whole recurrence is replayable bit-exactly
    * by the oracle's recursive CTE — the same fixed-point discipline
    * as [[graft.ops.Graph.pagerank]], applied to a sequential scan. An
    * inherently sequential recurrence can't be a window frame; it runs
    * as one `aggregate` HOF over each series' day-sorted array. That
    * is NOT a scale liability: the recursion runs at the day grain
    * AFTER the data-sized aggregation, so the array length is bounded
    * by the calendar span, not the row count (the [[stlDecompose]] /
    * text_zipf argument — at 100 TB the exchange still carries
    * (series, day) partials, never events). */
  def holtLinear(events: DataFrame): DataFrame = {
    val st = holtState(events)
    st.select(col("event_type"), col("day"), col("cents"),
        Det.rfloor(col("level_c").cast("double") / 100, 4).as("level"),
        Det.rfloor(col("trend_c").cast("double") / 100, 4).as("trend"),
        Det.rfloor(col("forecast_c").cast("double") / 100, 4).as("forecast"))
      .orderBy("event_type", "day")
  }

  /** The Holt recursion's INTEGER state — (event_type, day, cents,
    * level_c, trend_c, forecast_c) in exact cents — shared by
    * [[holtLinear]] (which formats it) and [[holtBacktest]] (which
    * must forecast from the UN-rounded state, or horizon errors would
    * carry presentation rounding). */
  private def holtState(events: DataFrame): DataFrame = {
    val outT = "array<struct<day:date,cents:bigint,level:bigint,trend:bigint,forecast:bigint>>"
    def half(c: Column) = floor(c.cast("double") / 2.0).cast("long")
    val init = struct(lit(0L).as("l"), lit(0L).as("b"),
      lit(0).as("n"), array().cast(outT).as("out"))
    dailyCents(events)
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("cents")))).as("arr"))
      .withColumn("res", aggregate(col("arr"), init, (acc, x) => {
        val y = x.getField("cents")
        val first = acc.getField("n") === 0
        val f = acc.getField("l") + acc.getField("b")
        val l2 = when(first, y).otherwise(half(y + f))
        val b2 = when(first, lit(0L))
          .otherwise(half(l2 - acc.getField("l") + acc.getField("b")))
        struct(l2.as("l"), b2.as("b"), (acc.getField("n") + 1).as("n"),
          concat(acc.getField("out"), array(struct(
            x.getField("day").as("day"), y.as("cents"),
            l2.as("level"), b2.as("trend"),
            when(first, lit(null).cast("long")).otherwise(f).as("forecast")))).as("out"))
      }))
      .select(col("event_type"), explode(col("res.out")).as("r"))
      .select(col("event_type"), col("r.day").as("day"),
        col("r.cents").as("cents"), col("r.level").as("level_c"),
        col("r.trend").as("trend_c"), col("r.forecast").as("forecast_c"))
  }

  /** HOLT ROLLING-ORIGIN BACKTEST (r9) — the audit every production
    * forecaster ships with: from each day's fitted state, the h-step
    * forecast `level_t + h·trend_t` (h = 1..3) scored against the
    * actual `y_{t+h}`, rolled up per (series, horizon) into n, MAE and
    * BIAS (signed mean error — a forecaster can have small MAE and
    * still lean systematically; bias is the column a capacity planner
    * reads first). Errors are exact integer cents end to end (the
    * state is [[holtState]]'s un-rounded recursion; presentation
    * rounding happens once, on the final per-group means), so the
    * whole frame is oracle-replayable.
    *
    * Scale shape: one window pass over the day-grain state frame (3
    * leads share one (series, day) sort — the lag_lead class), a
    * 3-way stack to long form, one series×horizon-bounded aggregate.
    * The recursion's own cost is [[holtLinear]]'s, already bounded by
    * the calendar span, not the row count. */
  def holtBacktest(events: DataFrame, horizons: Int = 3): DataFrame = {
    require(horizons >= 1 && horizons <= 8, "1..8 forecast horizons")
    val w = Window.partitionBy("event_type").orderBy("day")
    val withLeads = (1 to horizons).foldLeft(holtState(events)) { (df, h) =>
      df.withColumn(s"a$h", lead(col("cents"), h).over(w))
    }
    val stacked = withLeads.select(col("event_type"), expr(
      s"stack($horizons, " + (1 to horizons).map(h =>
        s"CAST($h AS BIGINT), a$h - (level_c + $h * trend_c)").mkString(", ") +
      ") AS (horizon, err)"))
    stacked.filter(col("err").isNotNull)
      .groupBy("event_type", "horizon")
      .agg(count(lit(1)).as("n"),
        sum(abs(col("err"))).as("sae"), sum(col("err")).as("se"))
      .select(col("event_type"), col("horizon"), col("n"),
        Det.rfloor(col("sae").cast("double") / col("n") / 100, 4).as("mae"),
        Det.rfloor(col("se").cast("double") / col("n") / 100, 4).as("bias"))
      .orderBy("event_type", "horizon")
  }

  /** OHLC RESAMPLE (r8) — the classic downsampling shape: per
    * (user, 30-minute bucket), open/high/low/close of `value` plus the
    * sample count. Open/close are arg-min/arg-max over the total order
    * (ts, event_id) via the min-struct idiom (`agg_arg_max`'s trick), so
    * ties are impossible and the draw is engine-portable; high/low/open/
    * close pass RAW doubles through — no accumulation, no rounding site,
    * nothing to drift. One hash aggregate with map-side partials: the
    * exchange carries (user, bucket) partial structs, not events —
    * exactly the candle-store build a 100 TB metrics pipeline runs, and
    * the output grain (entities × buckets) is what every later window
    * reads instead of raw events. */
  def resampleOhlc(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        window(col("ts"), "30 minutes").getField("start").as("bucket"),
        col("ts"), col("event_id"), col("value"))
      .groupBy(col("user_id"), col("bucket"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value"))).getField("value").as("close"),
        count(lit(1)).as("n"))
      .orderBy("user_id", "bucket")
}
