package graft

import org.apache.spark.sql.functions._

/** Epoch-artifact INTEGRITY + LIFECYCLE laws (r8). The serve-time
  * fingerprint check and the retention GC are the two halves the
  * train-once/serve-many tier was missing: resolve-by-name alone
  * silently served a stale artifact on a srcTag collision (same files,
  * different derivation, unbumped epoch), and old epochs accumulated
  * forever. Laws here:
  *   1. poisoned epoch — same srcTag + same epoch + DIFFERENT derivation
  *      must FAIL the serve, not serve the stale artifact;
  *   2. an independently-constructed frame with the SAME derivation
  *      serves fine (the check keys on canonicalized plans, not object
  *      identity);
  *   3. in-place source-file rewrite fails the serve via the
  *      (path, length, mtime) half of the fingerprint;
  *   4. verifyContent catches artifact content drift against the
  *      build-time (rows, Σxxhash64) meta;
  *   5. retain(prefix, keepN) drops all tables of older epochs —
  *      companions included — and keeps the newest keepN serving. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("poisoned epoch: same files + same epoch + different derivation fails the serve") {
    val base = Tables.orders(spark, sfDir)
    ops.Aggregates.ensureQuantileHist(spark, base, epoch = 8101L)
    // a DERIVED frame shares srcTag (same input files) — pre-r8 this
    // silently served the stale full-table histogram
    val derived = base.filter(col("o_orderkey") % 2 === 0)
    val e = intercept[IllegalStateException] {
      ops.Aggregates.ensureQuantileHist(spark, derived, epoch = 8101L)
    }
    assert(e.getMessage.contains("epoch collision"), e.getMessage)
    // and the artifact itself is untouched: the ORIGINAL frame still serves
    val again = ops.Aggregates.ensureQuantileHist(spark, base, epoch = 8101L)
    assert(spark.table(again).count() > 0)
  }

  test("same derivation, independently constructed, serves without rebuild") {
    val t1 = ops.Aggregates.ensureQuantileHist(
      spark, Tables.orders(spark, sfDir), epoch = 8102L)
    val before = spark.table(t1).collect().toSet
    // fresh construction of the same plan — canonicalized equality, not
    // object identity, is what the fingerprint keys on
    val t2 = ops.Aggregates.ensureQuantileHist(
      spark, Tables.orders(spark, sfDir), epoch = 8102L)
    assert(t1 === t2)
    assert(spark.table(t2).collect().toSet === before)
  }

  test("in-place source rewrite fails the serve on the file-status fingerprint") {
    val path = "/tmp/graft_wh_spec_src"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(path)
    val name = Warehouse.ensure(spark, "wh_spec_rewrite_e1",
        source = Some(spark.read.parquet(path))) { n =>
      spark.read.parquet(path).groupBy(col("v")).count()
        .write.mode("overwrite").saveAsTable(n)
    }
    // rewrite the SAME path with different content (new part files /
    // lengths / mtimes); the derivation — read parquet at this path —
    // is unchanged, so only the file half of the fingerprint can catch it
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(path)
    spark.catalog.refreshByPath(path)
    val e = intercept[IllegalStateException] {
      Warehouse.ensure(spark, name, source = Some(spark.read.parquet(path))) { n =>
        fail(s"builder must not run on an existing table $n")
      }
    }
    assert(e.getMessage.contains("stale artifact"), e.getMessage)
  }

  test("verifyContent: green after build, loud after artifact content drift") {
    val docs = Tables.documents(spark, sfDir)
    val name = Warehouse.ensure(spark, "wh_spec_content_e1", source = Some(docs)) { n =>
      docs.groupBy(col("lang")).count().write.mode("overwrite").saveAsTable(n)
    }
    assert(Warehouse.verifyContent(spark, name))
    // corrupt the artifact in place (meta untouched) — the deep check
    // must see the (rows, content hash) drift
    Seq(("xx", 999L)).toDF("lang", "count")
      .write.mode("overwrite").saveAsTable(name)
    val e = intercept[IllegalStateException] { Warehouse.verifyContent(spark, name) }
    assert(e.getMessage.contains("content drift"), e.getMessage)
  }

  test("serve path survives an external artifact rewrite behind a live session (r14)") {
    // The r13 driver failure: another JVM rewrote the persisted BPE
    // model's `_meta` directory mid-session; this session's catalog
    // still held the OLD file listing, so every later read failed
    // FAILED_READ_FILE.FILE_NOT_EXIST for the rest of the session.
    // Simulate the rewrite at the FS level (same bytes, new paths —
    // invisible to this session's cache) and require the serve path to
    // refresh-and-serve instead of dying on the stale listing.
    val docs = Tables.documents(spark, sfDir)
    val name = Warehouse.ensure(spark, "wh_spec_extrewrite_e1", source = Some(docs)) { n =>
      docs.groupBy(col("lang")).count().write.mode("overwrite").saveAsTable(n)
    }
    // read once so the session caches the artifact's file listing
    // (the build itself also reads it for the content fingerprint);
    // no serve-path call in between — ensure would refresh the cache,
    // which is exactly the behavior under test below
    assert(spark.table(name).count() > 0)
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(name, name + "_meta").foreach { t =>
      val dir = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      val fs = dir.getFileSystem(conf)
      fs.listStatus(dir).filter(_.getPath.getName.startsWith("part-")).foreach { s =>
        fs.rename(s.getPath,
          new org.apache.hadoop.fs.Path(dir, "rewrite-" + s.getPath.getName))
      }
    }
    // precondition: the stale cached listing really does poison a raw
    // read (the r13 signature) — if Spark ever stops caching listings
    // this assert flags that the scenario no longer exercises anything
    val raw = intercept[Throwable] { spark.table(name).count() }
    assert(Warehouse.isStaleRead(raw), s"expected stale-read failure, got $raw")
    // the hardened serve path refreshes before reading: same source,
    // same content — it must serve cleanly, and the artifact and its
    // meta must both be readable afterwards
    val served = Warehouse.ensure(spark, name, source = Some(docs)) { _ =>
      fail("rebuild must not run: the artifact exists and is intact")
    }
    assert(spark.table(served).count() > 0)
    assert(Warehouse.verifyContent(spark, served))
  }

  test("retain: older epochs dropped with their companions, newest keepN keep serving") {
    val src = Tables.nation(spark, sfDir)
    def build(epoch: Long): String =
      Warehouse.ensure(spark, s"wh_spec_gc_e$epoch",
          companions = Seq(s"wh_spec_gc_e${epoch}_model"), source = Some(src)) { n =>
        src.groupBy(col("n_regionkey")).count().write.mode("overwrite").saveAsTable(n)
        src.limit(1).write.mode("overwrite").saveAsTable(n + "_model")
      }
    val names = Seq(21L, 22L, 23L).map(build)
    val dropped = Warehouse.retain(spark, "wh_spec_gc", keepN = 2)
    assert(dropped === Seq("wh_spec_gc_e21", "wh_spec_gc_e21_meta", "wh_spec_gc_e21_model"),
      s"dropped $dropped")
    assert(!spark.catalog.tableExists("wh_spec_gc_e21"))
    assert(!spark.catalog.tableExists("wh_spec_gc_e21_model"))
    assert(!spark.catalog.tableExists("wh_spec_gc_e21_meta"))
    // the kept epochs still serve — table readable AND fingerprint-clean
    Seq(names(1), names(2)).foreach { n =>
      assert(spark.table(n).count() > 0)
      assert(Warehouse.verifyContent(spark, n))
    }
    // the warehouse directory of the dropped epoch is gone too
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/wh_spec_gc_e21")
    assert(!loc.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(loc))
  }

  test("retain: epoch is the LAST _e token; keep-N grouped per name stem (r9)") {
    // Two GC hazards from the r8 advice: (a) a srcTag path segment like
    // '.../e2/...' munges to '_e2_' BEFORE the real epoch — a first-match
    // parse reads it as the epoch and DROP targets the wrong grouping;
    // (b) epochs pooled across every table sharing the prefix let one
    // corpus's newer epochs doom another corpus's only artifact.
    val src = Tables.nation(spark, sfDir).limit(1)
    def mk(name: String): Unit = src.write.mode("overwrite").saveAsTable(name)
    mk("wh_spec_gc2_data_e2_run_e9")
    mk("wh_spec_gc2_data_e2_run_e10")
    mk("wh_spec_gc2_data_e2_run_e11")
    mk("wh_spec_gc2_other_e3") // different corpus, same prefix, sole epoch
    val dropped = Warehouse.retain(spark, "wh_spec_gc2", keepN = 2)
    // corpus A drops only ITS oldest epoch (9 — the trailing token, not the
    // munged '_e2_'); corpus B's only artifact survives despite its older
    // epoch number because keep-N is decided within its own stem
    assert(dropped === Seq("wh_spec_gc2_data_e2_run_e9"), s"dropped $dropped")
    assert(spark.catalog.tableExists("wh_spec_gc2_data_e2_run_e10"))
    assert(spark.catalog.tableExists("wh_spec_gc2_data_e2_run_e11"))
    assert(spark.catalog.tableExists("wh_spec_gc2_other_e3"))
    Seq("wh_spec_gc2_data_e2_run_e10", "wh_spec_gc2_data_e2_run_e11",
      "wh_spec_gc2_other_e3").foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("retain: property sweep over hostile name soups (r10)") {
    // The r9 grammar fix was spec-pinned on two handwritten cases; this
    // sweep generates adversarial pools — epoch-shaped tokens in EVERY
    // path-segment position, multiple corpora sharing the prefix,
    // leading-zero epochs, companion suffixes, tables with no epoch at
    // all, and names outside the prefix — and checks the plan against
    // an INDEPENDENT token-wise reference parse plus the retention laws.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val seg: Gen[String] = Gen.frequency(
      4 -> Gen.oneOf("data", "run", "idx", "m", "x9", "v2a"),
      3 -> Gen.chooseNum(0, 12).map(i => s"e$i"),   // decoy epoch tokens
      1 -> Gen.const("e007"),                        // leading zeros
      1 -> Gen.const("ee5"))                         // near-miss token
    val family: Gen[Seq[String]] = for {
      nSegs <- Gen.chooseNum(0, 3)
      segs <- Gen.listOfN(nSegs, seg)
      epochs <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 20L)).map(_.distinct)
      comp <- Gen.someOf(Seq("_model", "_meta"))
    } yield {
      val stem = ("whp_gc" +: segs).mkString("_")
      epochs.flatMap(e => s"${stem}_e$e" +: comp.map(c => s"${stem}_e$e$c").toSeq)
    }
    val pool: Gen[(Seq[String], Int)] = for {
      fams <- Gen.nonEmptyListOf(family)
      noise <- Gen.someOf(Seq("whp_gc_plain", "whp_gc_e", "whp_gc_exx_7",
        "other_prefix_e1", "whp_gc")) // epoch-free / foreign-prefix noise
      keepN <- Gen.chooseNum(1, 3)
    } yield ((fams.flatten ++ noise).distinct, keepN)
    // independent reference: token-split parse (the regex-free reading
    // of the grammar — epoch = LAST "_"-delimited token of form e<digits>
    // at position > 0; stem = the name with that token spliced out)
    def refPlan(tables: Seq[String], prefix: String, keepN: Int): Seq[String] = {
      val tagged = tables.filter(_.startsWith(prefix)).flatMap { t =>
        val toks = t.split("_", -1)
        val idx = toks.zipWithIndex.lastIndexWhere {
          case (tok, i) => i > 0 && tok.matches("e\\d+")
        }
        if (idx < 0) None
        else Some((t,
          (toks.take(idx) ++ toks.drop(idx + 1)).mkString("_"),
          toks(idx).drop(1).toLong))
      }
      tagged.groupBy(_._2).valuesIterator.flatMap { fam =>
        val keep = fam.map(_._3).distinct.sorted(Ordering[Long].reverse)
          .take(keepN).toSet
        fam.collect { case (t, _, e) if !keep(e) => t }
      }.toSeq.sorted
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, Prop.forAll(pool) { case (tables, keepN) =>
      val planned = Warehouse.retainPlan(tables, "whp_gc", keepN)
      val ref = refPlan(tables, "whp_gc", keepN)
      val survivors = tables.filterNot(planned.toSet)
      // law 1: the regex grammar == the token-wise reference, exactly
      val parity = planned == ref
      // law 2: epoch-free and foreign-prefix names are never dropped
      val noiseSafe = planned.forall(t =>
        t.startsWith("whp_gc") && "_e(\\d+)(?=_|$)".r.findFirstIn(t).isDefined)
      // law 3: every stem keeps at least one epoch (sole epochs survive)
      val keepsOne = {
        def stemOf(t: String) = {
          val m = "_e(\\d+)(?=_|$)".r.findAllMatchIn(t).toList.last
          t.substring(0, m.start) + t.substring(m.end)
        }
        val stems = tables.filter(t => t.startsWith("whp_gc") &&
          "_e(\\d+)(?=_|$)".r.findFirstIn(t).isDefined).groupBy(stemOf)
        stems.forall { case (s, fam) =>
          survivors.exists(t => fam.contains(t))
        }
      }
      parity && noiseSafe && keepsOne
    })
    assert(res.passed, s"retain property sweep: $res")
  }
}
