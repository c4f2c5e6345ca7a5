package graft

import org.apache.spark.sql.functions._

/** Semantic gates for the fourth-session tier (time-series repair /
  * scores, budget cut, epoch replication, FK audit, moment stats).
  * The DuckDB oracle already cross-checks every key engine-to-engine;
  * these are INDEPENDENT driver-side re-derivations (plain Scala
  * arithmetic, no SQL on either side) plus the invariants that must
  * hold for ANY input — the GraphSpec doctrine.
  */
class TimeSeriesSpec extends SparkSpec {

  /** Driver-side reference: exact per-(type, day) cents, same lift law
    * as TimeSeries.dailyCents. */
  private lazy val refDaily: Map[(String, java.time.LocalDate), Long] = {
    Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (col("value") * 100).cast("decimal(18,0)").cast("bigint").as("c"))
      .collect()
      .groupBy(r => (r.getString(0), r.getDate(1).toLocalDate))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
  }

  test("ts_interpolate_linear: obs rows exact, interp rows on the chord, edges null") {
    val rows = ops.TimeSeries.interpolateLinear(Tables.events(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    var interpChecked = 0
    byType.foreach { case (tpe, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      // the observed subset under the dropout law, as (epochDay, cents)
      val obs = sorted.flatMap { r =>
        val d = r.getDate(1).toLocalDate
        val kept = d.getDayOfMonth % 4 == 0 || d.getDayOfMonth % 4 == 3
        if (kept) refDaily.get((tpe, d)).map(c => d.toEpochDay -> c) else None
      }
      sorted.foreach { r =>
        val d = r.getDate(1).toLocalDate
        val src = r.getString(2)
        val ed = d.toEpochDay
        val prev = obs.filter(_._1 <= ed).lastOption
        val next = obs.find(_._1 >= ed)
        (prev, next) match {
          case (Some((pd, pc)), Some((nd, nc))) =>
            val expected =
              if (pd == ed) { assert(src === "obs"); pc.toDouble }
              else {
                assert(src === "interp"); interpChecked += 1
                pc.toDouble + (nc.toDouble - pc.toDouble) * (ed - pd) / (nd - pd)
              }
            val want = math.floor(expected / 100 * 1e4 + 0.5) / 1e4
            assert(r.getDouble(3) === want, s"$tpe $d")
          case _ =>
            assert(src === "edge", s"$tpe $d")
            assert(r.isNullAt(3))
        }
      }
    }
    // the dropout fixture must actually create holes to repair
    assert(interpChecked > 10, s"only $interpChecked interp rows — fixture degenerate")
  }

  test("ts_ema: matches the power-of-two lag formula recomputed in-memory") {
    val rows = ops.TimeSeries.ema8(Tables.events(spark, sfDir)).collect()
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      // the lag chain is over OBSERVED rows (the oracle's LAG agrees);
      // recompute by row index, not by calendar adjacency
      val sorted = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay).toIndexedSeq
      sorted.zipWithIndex.foreach { case (r, i) =>
        var num = 0L; var den = 0L
        (0 to 7).foreach { j =>
          if (i - j >= 0) { num += sorted(i - j).getLong(2) * (1L << (7 - j)); den += 1L << (7 - j) }
        }
        val want = math.floor(num.toDouble / den.toDouble / 100 * 1e4 + 0.5) / 1e4
        assert(r.getDouble(3) === want, s"$tpe row $i")
      }
    }
  }

  test("ts_rolling_anomaly: window arithmetic matches a driver-side recompute") {
    val rows = ops.TimeSeries.rollingAnomaly(Tables.events(spark, sfDir)).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay).toIndexedSeq
      sorted.zipWithIndex.foreach { case (r, i) =>
        val win = sorted.slice(math.max(0, i - 6), i + 1).map(_.getLong(2))
        assert(r.getLong(3) === win.size.toLong)
        val n = win.size.toDouble
        val sx = win.sum.toDouble
        val sxx = win.map(c => c * c).sum.toDouble
        val mean = sx / n
        assert(r.getDouble(4) === math.floor(mean / 100 * 1e4 + 0.5) / 1e4)
        val std = if (n > 1) math.sqrt((sxx - sx * sx / n) / (n - 1)) else 0.0
        if (std > 0) {
          val z = (r.getLong(2) - mean) / std
          assert(r.getDouble(5) === math.floor(z * 1e4 + 0.5) / 1e4)
          assert(r.getLong(6) === (if (math.abs(z) > 2) 1L else 0L))
        } else { assert(r.isNullAt(5)); assert(r.getLong(6) === 0L) }
      }
    }
  }

  test("token budget: two-phase cut selects EXACTLY the naive greedy prefix") {
    val docs = Tables.documents(spark, sfDir)
    val got = llm.TrainingPrep.tokenBudget(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // naive reference: global (q desc, doc_id) order, running total ≤ budget
    val scored = docs.select(col("doc_id"),
        llm.TextAnalysis.qualityMilliCol(col("text")).as("q"),
        size(llm.TextOps.tokens(col("text"))).cast("long").as("tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    val want = scored.takeWhile { case (_, _, tok) => { cum += tok; cum <= 12000L } }
    assert(got.toSeq === want.toSeq)
    assert(want.nonEmpty && want.length < scored.length,
      "budget fixture degenerate: cut selects nothing or everything")
  }

  test("epoch upsample: per-doc copies match the tier law, corpus pre-shuffled") {
    val docs = Tables.documents(spark, sfDir)
    val rows = llm.TrainingPrep.epochUpsample(docs).collect()
    val copies = rows.groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.length }
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val q = rs.head.getLong(1)
      val want = if (q >= 6150L) 3 else if (q >= 6000L) 2 else 1
      assert(rs.length === want, s"doc $id q=$q")
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1 to want).map(_.toLong))
    }
    assert(copies.values.toSet.size > 1, "tier thresholds degenerate: all docs same tier")
    // pre-shuffled: output order is the md5 key order, not doc_id order
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids !== ids.sorted, "output arrived in doc order — shuffle key inert")
  }

  test("referential integrity: control edge green, orphan law matches mod-m drop") {
    val r = ops.DataQuality.referentialIntegrity(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.part(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.region(spark, sfDir)).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("nation.regionkey->region")._2 === 0L) // intact control edge
    // independent recompute of one fixture edge
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey").collect().map(_.getLong(0))
    val ok = Tables.orders(spark, sfDir).select("o_orderkey").collect()
      .map(_.getLong(0)).filter(_ % 97 != 0).toSet
    val orphans = li.filterNot(ok)
    val (childRows, orphanRows, orphanKeys) = r("lineitem.orderkey->orders")
    assert(childRows === li.length.toLong)
    assert(orphanRows === orphans.length.toLong)
    assert(orphanKeys === orphans.distinct.length.toLong)
    assert(orphanRows > 0, "fixture degenerate: no orphans on the mod-97 edge")
  }

  test("skew/kurtosis: exact power sums match a BigInt driver recompute") {
    val rows = ops.Aggregates.skewKurtosis(Tables.lineitem(spark, sfDir)).collect()
    val qs = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), (col("l_quantity") * 100).cast("decimal(18,0)").cast("bigint"))
      .collect().groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)) }
    rows.foreach { r =>
      val xs = qs(r.getString(0))
      val n = xs.length.toDouble
      def s(p: Int) = xs.map(x => BigInt(x).pow(p)).sum.toDouble
      val m = s(1) / n; val r2 = s(2) / n; val r3 = s(3) / n; val r4 = s(4) / n
      val m2 = r2 - m * m
      val m3 = r3 - 3 * m * r2 + 2 * m * m * m
      val m4 = r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getDouble(2) === math.floor(m / 100 * 1e4 + 0.5) / 1e4)
      assert(r.getDouble(3) === math.floor(math.sqrt(m2) / 100 * 1e4 + 0.5) / 1e4)
      assert(r.getDouble(4) === math.floor(m3 / (m2 * math.sqrt(m2)) * 1e6 + 0.5) / 1e6)
      assert(r.getDouble(5) === math.floor((m4 / (m2 * m2) - 3.0) * 1e6 + 0.5) / 1e6)
    }
  }

  test("gini: bounded in [0,1), zero iff all spends equal, matches rank formula") {
    val rows = ops.Aggregates.giniSpend(Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"${r.getString(0)} gini=$g")
    }
    // independent recompute for the largest nation
    // key columns may surface as INT32 in the parquet — widen via Number
    def asL(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val spendByNation = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), (col("o_totalprice") * 100).cast("decimal(18,0)").cast("bigint").as("c"))
      .collect().groupBy(asL(_, 0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).sum }
    val custNation = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
      .collect().map(r => asL(r, 0) -> asL(r, 1)).toMap
    val nationName = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      .collect().map(r => asL(r, 0) -> r.getString(1)).toMap
    val byNation = spendByNation.toSeq
      .map { case (ck, c) => (nationName(custNation(ck)), ck, c) }
      .groupBy(_._1)
    val (nn, members) = byNation.maxBy(_._2.size)
    val xs = members.sortBy(m => (m._3, m._2)) // (cents, custkey) ascending
    val n = xs.size
    val sw = xs.map(x => BigInt(x._3)).sum
    val siw = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * BigInt(x._3) }.sum
    val want = (2.0 * siw.toDouble - (n + 1) * sw.toDouble) / (n.toDouble * sw.toDouble)
    val got = rows.find(_.getString(0) == nn).get.getDouble(2)
    assert(got === math.floor(want * 1e6 + 0.5) / 1e6)
  }

  test("degree stats: histogram masses equal node count and edge count") {
    val docs = Tables.documents(spark, sfDir)
    val rows = ops.Graph.degreeStats(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val edges = ids.map(id => (id % 200, (id * 31 + id / 7) % 200)).distinct
    val nNodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.length.toLong
    Seq("out", "in").foreach { dir =>
      val h = rows.filter(_._1 == dir)
      assert(h.map(_._3).sum === nNodes, s"$dir node mass")
      assert(h.map(x => x._2 * x._3).sum === edges.length.toLong, s"$dir edge mass")
    }
  }

  test("readability: corpus-level Flesch matches integer-count recompute per source") {
    val rows = llm.TextAnalysis.readability(Tables.documents(spark, sfDir)).collect()
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val texts = docs(r.getString(0)).map(_.getString(1))
      // word law = size(split(text, " ")): single-space split, empties kept
      val words = texts.map(t => t.split(" ", -1).length.toLong).sum
      val sentences = texts.map(t => math.max("[.!?]+".r.findAllIn(t).size, 1).toLong).sum
      val syllables = texts.map(t => "[aeiouy]+".r.findAllIn(t).size.toLong).sum
      assert(r.getLong(1) === texts.length.toLong)
      assert(r.getLong(2) === words)
      assert(r.getLong(3) === sentences)
      assert(r.getLong(4) === syllables)
      val flesch = 206.835 - 1.015 * (words.toDouble / sentences) - 84.6 * (syllables.toDouble / words)
      assert(r.getDouble(5) === math.floor(flesch * 1e4 + 0.5) / 1e4)
    }
  }

  test("ohlc resample matches a brute-force candle build (r8)") {
    val ev = Tables.events(spark, sfDir)
    val got = ops.TimeSeries.resampleOhlc(ev).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    val raw = ev.select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val expect = raw.groupBy { case (u, ts, _, _) =>
        (u, new java.sql.Timestamp(ts.getTime / 1800000L * 1800000L))
      }.map { case ((u, b), es) =>
        val sorted = es.sortBy(e => (e._2.getTime, e._3))
        (u, b, sorted.head._4, es.map(_._4).max, es.map(_._4).min,
          sorted.last._4, es.length.toLong)
      }.toSeq
    assert(got.sorted === expect.sorted, "OHLC diverged from brute force")
    // candle invariants: low <= open/close <= high, n >= 1
    got.foreach { case (_, _, o, h, l, c, n) =>
      assert(l <= o && o <= h && l <= c && c <= h && n >= 1L)
    }
  }

  test("activity streaks match a brute-force run-length scan (r8)") {
    val ev = Tables.events(spark, sfDir)
    val got = ops.Behavior.activityStreaks(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toString, r.getLong(3), r.getLong(4)))
      .toSeq
    val days = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val expect = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).distinct.sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      // split into runs of consecutive days
      val runs = sorted.foldLeft(List.empty[List[java.time.LocalDate]]) {
        case (acc @ (cur :: rest), d) if d.toEpochDay == cur.head.toEpochDay + 1 =>
          (d :: cur) :: rest
        case (acc, d) => List(d) :: acc
      }.map(r => (r.length.toLong, r.last)) // (len, start day)
      val best = runs.maxBy { case (len, start) => (len, start.toEpochDay) }
      (u, best._1, best._2.toString, runs.length.toLong, sorted.length.toLong)
    }.toSeq
    assert(got.sorted === expect.sorted, "streaks diverged from brute force")
  }

  test("stl anomaly: med/MAD replay from the decomposition, edge nulls stay null (r8)") {
    val ev = Tables.events(spark, sfDir)
    val stl = ops.TimeSeries.stlDecompose(ev).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    val got = ops.TimeSeries.anomalyStl(ev).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getInt(5))))).toMap
    def rf4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    // exact percentile(0.5) replication: Spark interpolates between the
    // two middle order statistics at even n
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (pos - pos.toInt) * (hi - lo)
    }
    stl.groupBy(_._1).foreach { case (tpe, rows) =>
      val resids = rows.flatMap(_._3.toSeq).map(_.toDouble)
      val med = rf4(median(resids))
      val mad = rf4(median(resids.map(r => math.abs(r - med))))
      rows.foreach { case (_, day, ro) =>
        val (score, flag) = got((tpe, day))
        ro match {
          case None =>
            assert(score.isEmpty && flag.isEmpty, s"$tpe@$day edge must stay null")
          case Some(r) =>
            if (mad > 0) assert(score.contains(rf4((r - med) / mad)), s"$tpe@$day score")
            else assert(score.isEmpty, s"$tpe@$day zero-MAD score")
            assert(flag.contains(if (math.abs(r - med) > 3.0 * mad) 1 else 0), s"$tpe@$day flag")
        }
      }
    }
    // the flag must discriminate: normal days exist everywhere; at least
    // one series must carry structure the decomposition can't explain
    val flags = got.values.flatMap(_._2).toSeq
    assert(flags.contains(0))
  }

  test("interval merge matches a brute-force sweep; spans are disjoint and cover (r8)") {
    val ev = Tables.events(spark, sfDir)
    val got = ops.Windows.intervalMerge(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val raw = ev.select(col("user_id"), expr("unix_micros(ts)").as("s"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val W = 600000000L
    val expect = raw.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val iv = es.sortBy(e => (e._2, e._3)).map(e => (e._2, e._2 + W))
      // sweep: extend the open span while the next start ≤ running max end
      val islands = iv.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s0, e0, n) :: rest, (s, e)) if s <= e0 =>
          (s0, math.max(e0, e), n + 1) :: rest
        case (acc, (s, e)) => (s, e, 1L) :: acc
      }.reverse
      islands.zipWithIndex.map { case ((s, e, n), i) =>
        (u, (i + 1).toLong, s, e, e - s, n)
      }
    }
    assert(got.sorted === expect.sorted, "interval merge diverged from sweep")
    // spans per user are strictly disjoint and interval counts cover
    got.groupBy(_._1).foreach { case (u, spans) =>
      val s = spans.sortBy(_._2)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._4 < b._3, s"user $u spans overlap")
        case _ => ()
      }
    }
    assert(got.map(_._6).sum === raw.length.toLong)
    // the fixture must actually merge something
    assert(got.exists(_._6 > 1))
  }

  test("windowed funnel matches a brute-force per-user replay; bound tightens levels (r8)") {
    val ev = Tables.events(spark, sfDir)
    val got = ops.Behavior.funnelWindowed(ev).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    val raw = ev.select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val W = 24L * 3600 * 1000000L
    val expect = raw.groupBy(_._1).map { case (u, es) =>
      val t1 = es.collect { case (_, us, "view") => us }.minOption
      val dl = t1.map(_ + W)
      val t2 = t1.flatMap(a => es.collect {
        case (_, us, "click") if us > a && us <= dl.get => us }.minOption)
      val t3 = t2.flatMap(b => es.collect {
        case (_, us, "purchase") if us > b && us <= dl.get => us }.minOption)
      u -> ((if (t3.isDefined) 3 else if (t2.isDefined) 2 else if (t1.isDefined) 1 else 0, t1))
    }
    assert(got === expect, "windowed funnel diverged from replay")
    // the bound must BITE on this fixture: windowed completion count is
    // strictly below the unbounded funnel's step-3 reach
    val unbounded = ops.Behavior.funnelSteps(ev).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val w3 = got.values.count(_._1 == 3).toLong
    assert(w3 < unbounded(3), s"windowed $w3 vs unbounded ${unbounded(3)}")
    assert(w3 > 0, "nobody completes inside the window — fixture vacuous")
  }

  test("last-touch attribution matches a brute-force per-user replay (r8)") {
    val ev = Tables.events(spark, sfDir)
    val got = ops.Behavior.lastTouchAttribution(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    val raw = ev.select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val lookbackUs = 7L * 24 * 3600 * 1000000L
    val attributed = raw.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.zipWithIndex.collect { case ((_, us, _, "purchase", v), i) =>
        sorted.take(i).filter(e => e._4 == "view" || e._4 == "click").lastOption match {
          case Some(t) if us - t._2 <= lookbackUs => (t._4, v, Some(us - t._2))
          case _ => ("direct", v, None)
        }
      }
    }
    val expect = attributed.groupBy(_._1).map { case (ch, rs) =>
      ch -> ((rs.size.toLong,
        rs.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble,
        rs.flatMap(_._3).reduceOption(_ + _)))
    }
    assert(got === expect, "attribution diverged from brute force")
    // the fixture must exercise all three channels or the test is vacuous
    assert(got.keySet === Set("click", "view", "direct"))
  }

  private def rfloor(x: Double, dp: Int): Double = {
    val s = math.pow(10, dp); math.floor(x * s + 0.5) / s
  }

  /** Per-type day-sorted cents series from the shared driver reference. */
  private def series(tpe: String): Seq[Long] =
    refDaily.toSeq.collect { case ((t, d), c) if t == tpe => d.toEpochDay -> c }
      .sortBy(_._1).map(_._2)

  test("cusum changepoint matches a BigInt argmax re-derivation (r8)") {
    val got = ops.TimeSeries.cusumChangepoint(Tables.events(spark, sfDir)).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val xs = series(r.getString(0))
      val n = BigInt(xs.length)
      val tot = BigInt(xs.sum)
      val prefix = xs.scanLeft(BigInt(0))(_ + _).tail
      // D_t = n·S_t − t·T for t < n; argmax |D| with earliest-day ties
      val (dBest, tBest) = prefix.zipWithIndex.dropRight(1)
        .map { case (s, i) => ((n * s - BigInt(i + 1) * tot).abs, i + 1) }
        .maxBy { case (d, t) => (d, -t) }
      assert(r.getLong(2) === tBest.toLong, s"t_cp for ${r.getString(0)}")
      assert(r.getLong(3) === xs.length.toLong)
      val s = prefix(tBest - 1)
      val mb = s.toDouble / tBest / 100
      val ma = (tot - s).toDouble / (xs.length - tBest) / 100
      assert(r.getDouble(4) === rfloor(mb, 4) && r.getDouble(5) === rfloor(ma, 4))
      assert(r.getDouble(6) === rfloor(ma - mb, 4))
      assert(dBest > 0 || r.getDouble(6) === 0.0)
    }
  }

  test("autocorr matches an exact-BigInt ACF re-derivation; r0 would be 1 (r8)") {
    val got = ops.TimeSeries.autocorr(Tables.events(spark, sfDir)).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      val xs = series(tpe).map(BigInt(_))
      val n = BigInt(xs.length)
      val tot = xs.sum
      val c = xs.map(x => n * x - tot)
      val den = c.map(x => x * x).sum
      rows.foreach { r =>
        val k = r.getLong(1).toInt
        val pairs = c.drop(k).zip(c.dropRight(k))
        assert(r.getLong(2) === (xs.length - k).toLong, s"n_pairs lag $k")
        val num = pairs.map { case (a, b) => a * b }.sum
        assert(r.getDouble(3) === rfloor(num.toDouble / den.toDouble, 6),
          s"acf($tpe, $k)")
        // ACF is bounded: |r_k| <= 1 up to rounding
        assert(math.abs(r.getDouble(3)) <= 1.0)
      }
    }
  }

  test("seasonal dow profile matches grouped re-derivation; indexes average ~1 (r8)") {
    val got = ops.TimeSeries.seasonalDow(Tables.events(spark, sfDir)).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      val byDow = refDaily.toSeq.collect { case ((t, d), c) if t == tpe =>
        (math.floorMod(d.toEpochDay, 7L), c) }.groupBy(_._1)
      val nd = byDow.values.map(_.size).sum
      val tot = byDow.values.flatMap(_.map(_._2)).sum
      rows.foreach { r =>
        val cs = byDow(r.getLong(1)).map(_._2)
        assert(r.getLong(2) === cs.size.toLong)
        assert(r.getDouble(3) === rfloor(cs.sum.toDouble / cs.size / 100, 4))
        assert(r.getDouble(4) === rfloor(
          cs.sum.toDouble * nd / (cs.size.toDouble * tot), 4))
      }
      // the weighted mean of seasonal indexes is 1 by construction:
      // Σ_dow n_dow·idx_dow = n — check within rounding slack
      val wsum = rows.map(r => r.getLong(2) * r.getDouble(4)).sum
      assert(math.abs(wsum / nd - 1.0) < 1e-3, s"index mass for $tpe")
    }
  }

  test("lttb downsample matches a driver replay; endpoints kept, one point per bucket (r8)") {
    val got = ops.TimeSeries.downsampleLttb(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2), r.getString(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (tpe, rows) =>
      val xs = refDaily.toSeq.collect { case ((t, d), c) if t == tpe =>
        d.toEpochDay -> c }.sortBy(_._1)
      val n = xs.length
      // replay the parallel-anchor selection with BigInt cross products
      val interior = xs.slice(1, n - 1).zipWithIndex
        .map { case (p, i) => (i.toLong * 10 / (n - 2), p) }
      val byB = interior.groupBy(_._1).map { case (b, ps) =>
        b -> ps.map(_._2) }.toSeq.sortBy(_._1)
      val sums = byB.map { case (b, ps) =>
        (b, ps.map(_._1).sum, ps.map(_._2).sum, ps.length.toLong) }
      val expectSel = byB.zipWithIndex.map { case ((b, ps), bi) =>
        val (axn, ayn, da) = if (bi == 0) (xs.head._1, xs.head._2, 1L)
          else { val p = sums(bi - 1); (p._2, p._3, p._4) }
        val (cxn, cyn, dc) = if (bi == byB.length - 1) (xs.last._1, xs.last._2, 1L)
          else { val p = sums(bi + 1); (p._2, p._3, p._4) }
        ps.map { case (px, py) =>
          val a2 = ((BigInt(cxn) * da - BigInt(axn) * dc) * (BigInt(py) * da - ayn)
            - (BigInt(cyn) * da - BigInt(ayn) * dc) * (BigInt(px) * da - axn)).abs
          (a2, px, py)
        }.maxBy { case (a2, px, _) => (a2, -px) }
      }.map { case (_, px, py) => (px, py) }
      val expect = ((xs.head._1, xs.head._2, "first") +:
        expectSel.map { case (x, y) => (x, y, "bucket") }) :+
        (xs.last._1, xs.last._2, "last")
      assert(rows.sortBy(_._2).map(r => (r._2, r._3, r._4)) === expect,
        s"lttb selection diverged for $tpe")
      // cardinality: endpoints + one survivor per non-empty bucket
      assert(rows.length === byB.length + 2)
    }
  }

  test("stl decompose: components reconstruct the value; trend matches a driver MA (r8)") {
    val got = ops.TimeSeries.stlDecompose(Tables.events(spark, sfDir)).collect()
    assert(got.nonEmpty)
    var interior = 0
    got.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      val xs = series(tpe)
      rows.sortBy(_.getDate(1).toLocalDate.toEpochDay).zipWithIndex.foreach {
        case (r, i) =>
          assert(r.getDouble(2) === rfloor(xs(i) / 100.0, 4)) // value
          if (i < 3 || i >= xs.length - 3) {
            assert(r.isNullAt(3) && r.isNullAt(5),
              s"edge row $i of $tpe should have null trend/resid")
          } else {
            interior += 1
            val t = xs.slice(i - 3, i + 4).sum / 7.0 / 100
            assert(r.getDouble(3) === rfloor(t, 4), s"trend($tpe,$i)")
            // reconstruction: value ≈ trend + seasonal + resid, each
            // rounded separately → ≤ 2e-4 slack
            val recon = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
            assert(math.abs(r.getDouble(2) - recon) <= 2e-4,
              s"reconstruction($tpe,$i): ${r.getDouble(2)} vs $recon")
          }
      }
    }
    assert(interior > 0)
  }

  test("rolling median matches a brute sorted-window middle; robust to the mean's outlier drag (r8)") {
    val got = ops.TimeSeries.rollingMedian(Tables.events(spark, sfDir)).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      val xs = series(tpe)
      rows.sortBy(_.getDate(1).toLocalDate.toEpochDay).zipWithIndex.foreach {
        case (r, i) =>
          val win = xs.slice(math.max(0, i - 6), i + 1).sorted
          assert(r.getLong(3) === win.size.toLong)
          val med =
            if (win.size % 2 == 1) win(win.size / 2).toDouble
            else (win(win.size / 2 - 1) + win(win.size / 2)) / 2.0
          assert(r.getDouble(4) === rfloor(med / 100, 4), s"median($tpe, $i)")
          assert(r.getLong(5) === (if (xs(i) > 2.0 * med) 1L else 0L))
      }
    }
  }

  test("sma crossover replays from a driver rolling-sum walk; sign never touches a float (r9)") {
    import org.apache.spark.sql.functions.{col, lit, sum, to_date}
    val got = ops.TimeSeries.smaCross(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getString(2), r.getLong(3)))
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((col("value") * lit(100)).cast("decimal(18,0)").cast("bigint")).as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val s = xs.sortBy(_._2)
      val cents = s.map(_._3)
      def roll(i: Int, n: Int): (Long, Long) = {
        val lo = math.max(0, i - n + 1)
        (cents.slice(lo, i + 1).sum, (i - lo + 1).toLong)
      }
      val states = s.indices.map { i =>
        val (ss, cs) = roll(i, 7)
        val (sl, cl) = roll(i, 28)
        (s(i)._2, ss * cl > sl * cs, ss * cl - sl * cs)
      }
      states.sliding(2).collect {
        case Seq((_, pa, _), (d, a, m)) if a != pa =>
          (t, d, if (a) "golden" else "death", m)
      }
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq === expect)
    assert(got.nonEmpty, "no crossings — vacuous fixture")
    // margin sign encodes direction exactly
    got.foreach { case (_, _, dir, m) =>
      assert(if (dir == "golden") m > 0 else m <= 0)
    }
  }

  test("holt backtest replays per-horizon errors from the BigInt recursion (r9)") {
    val got = ops.TimeSeries.holtBacktest(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.nonEmpty)
    def half(x: BigInt): BigInt = if (x >= 0) x / 2 else -((-x + 1) / 2)
    val types = got.keySet.map(_._1)
    types.foreach { tpe =>
      val xs = series(tpe)
      // replay the recursion, collecting the state per origin
      var l = BigInt(xs.head); var b = BigInt(0)
      val state = xs.zipWithIndex.map { case (y, i) =>
        if (i > 0) {
          val l2 = half(BigInt(y) + l + b)
          b = half(l2 - l + b); l = l2
        }
        (l, b)
      }
      (1 to 3).foreach { h =>
        val errs = state.indices.dropRight(h).map { t =>
          BigInt(xs(t + h)) - (state(t)._1 + BigInt(h) * state(t)._2)
        }
        val (n, mae, bias) = got((tpe, h.toLong))
        assert(n === errs.length.toLong, s"n($tpe, h=$h)")
        assert(mae === rfloor(errs.map(_.abs).sum.toDouble / errs.length / 100, 4),
          s"mae($tpe, h=$h)")
        assert(bias === rfloor(errs.sum.toDouble / errs.length / 100, 4),
          s"bias($tpe, h=$h)")
      }
    }
    // the audit must be non-vacuous: some bias must be nonzero somewhere
    assert(got.values.exists(_._3 != 0.0))
  }

  test("holt linear smoothing replays the floor-halved recursion in BigInt (r8)") {
    val got = ops.TimeSeries.holtLinear(Tables.events(spark, sfDir)).collect()
    assert(got.nonEmpty)
    def half(x: BigInt): BigInt = // floor division by 2 (not trunc-to-zero)
      if (x >= 0) x / 2 else -((-x + 1) / 2)
    got.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      val xs = series(tpe)
      val sorted = rows.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      assert(sorted.length === xs.length, s"row count for $tpe")
      var l = BigInt(xs.head); var b = BigInt(0)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val y = BigInt(xs(i))
        val fc: Option[BigInt] = if (i == 0) None else Some(l + b)
        if (i > 0) {
          val l2 = half(y + l + b)
          b = half(l2 - l + b)
          l = l2
        }
        assert(r.getLong(2) === xs(i), s"cents($tpe, $i)")
        assert(r.getDouble(3) === rfloor(l.toDouble / 100, 4), s"level($tpe, $i)")
        assert(r.getDouble(4) === rfloor(b.toDouble / 100, 4), s"trend($tpe, $i)")
        fc match {
          case None => assert(r.isNullAt(5), s"forecast($tpe, 0) must be null")
          case Some(f) =>
            assert(r.getDouble(5) === rfloor(f.toDouble / 100, 4), s"forecast($tpe, $i)")
        }
      }
    }
  }
}
