package graft

import org.apache.spark.sql.functions._
import graft.sync.{SnapshotDiff, Snapshots}

/** Diff/merge algebra (SURVEY §5.3): identity, round-trip, and positional
  * parity against a literal Scala port of the reference's `compare_data`
  * (syncquill.py:109-129) used as a property-test oracle.
  */
class SnapshotDiffSpec extends SparkSpec {

  private def customer = Tables.customer(spark, sfDir)

  test("diff(a, a) is empty") {
    val a = Snapshots.oldSnapshot(customer)
    assert(SnapshotDiff.diffKeyed(a, a, "slno").count() === 0)
  }

  test("round-trip law: apply(old, diff(old, new)) == new") {
    val old = Snapshots.oldSnapshot(customer)
    val neu = Snapshots.newSnapshot(customer)
    val applied = SnapshotDiff.applyChangeset(old, SnapshotDiff.diffKeyed(old, neu, "slno"), "slno")
    assert(applied.exceptAll(neu).count() === 0)
    assert(neu.exceptAll(applied).count() === 0)
  }

  test("diffPositional matches the literal compare_data port") {
    // literal port + engine JSON row-image encoding live in DiffLaws
    def compareDataRef(l1: Seq[Seq[String]], l2: Seq[Seq[String]], cols: Seq[String]) =
      DiffLaws.compareDataRef(l1, l2, cols)
    val bq = Snapshots.bqSnapshot(customer)
    val sheet = Snapshots.sheetSnapshot(customer)
    val cols = bq.columns.toSeq

    def toLists(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.orderBy(col("slno").cast("long")).collect()
        .map(r => cols.indices.map(i => String.valueOf(r.get(i)))).toSeq

    val expected = compareDataRef(toLists(bq), toLists(sheet), cols)
      .map { case (op, slno, c, o, n) => (op, slno.toLong, c, Option(o), Option(n)) }
      .toSet

    val actual = SnapshotDiff.diffPositional(bq, sheet, "slno").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3),
        Option(r.getString(4)), Option(r.getString(5))))
      .toSet

    assert(actual === expected)
  }

  test("incremental min/max: min-holder delete, group move, vanishing group") {
    import spark.implicits._
    import graft.sync.IncrementalAgg
    val old = Seq(
      (1L, "a", "1.00", "A"), (2L, "b", "5.00", "A"),   // A's min is row 1
      (3L, "c", "9.00", "B")                             // B has one row
    ).toDF("slno", "name", "acctbal", "segment")
    val neu = Seq(
      (2L, "b", "5.00", "A"),                            // row 1 deleted -> A min becomes 5
      (3L, "c", "9.00", "A"),                            // row 3 moves B->A -> B vanishes
      (4L, "d", "0.50", "C")                             // new group C
    ).toDF("slno", "name", "acctbal", "segment")
    val out = IncrementalAgg.applyToMinMax(
      IncrementalAgg.aggMinMax(old), SnapshotDiff.diffKeyed(old, neu, "slno"), old)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val expected = IncrementalAgg.aggMinMax(neu).orderBy("segment")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq === expected.toSeq)
    assert(!out.exists(_._1 == "B"), "group whose last row moved away must vanish")
    assert(out.find(_._1 == "A").get._2 === 5.0, "A's min must be rescanned after the min-holder left")
  }

  test("incremental join law: applyToJoin(view, diff) == new snapshot joined") {
    import graft.sync.IncrementalJoin
    val c = Tables.customer(spark, sfDir)
    val old = Snapshots.oldSnapshot(c)
    val neu = Snapshots.newSnapshot(c)
    val dim = IncrementalJoin.segmentDim(c)
    val maintained = IncrementalJoin.applyToJoin(
      IncrementalJoin.joinView(old, dim),
      SnapshotDiff.diffKeyed(old, neu, "slno"), old, dim)
    val recomputed = IncrementalJoin.joinView(neu, dim)
    assert(maintained.exceptAll(recomputed).count() === 0L)
    assert(recomputed.exceptAll(maintained).count() === 0L)
    // the CHANGED segment has no dim row -> those rows must drop
    assert(maintained.filter(col("segment") === "CHANGED").count() === 0L)
  }

  test("cdc apply: replay-order independent, deletes drop, late updates resurrect") {
    import graft.sync.Cdc
    val orders = Tables.orders(spark, sfDir)
    val log = Cdc.changelog(orders).cache()
    val applied = Cdc.apply(log).cache()
    // order independence: compact of a reversed-arrival log is identical
    val reversed = Cdc.apply(log.orderBy(col("seq").desc, col("key").desc))
    assert(applied.exceptAll(reversed).count() === 0L)
    assert(reversed.exceptAll(applied).count() === 0L)
    // deleted-not-resurrected keys are gone
    val deadKeys = applied.filter(col("key") % 13 === 0 && !(col("key") % 17 === 3))
    assert(deadKeys.count() === 0L)
    // delete-then-late-update keys resurrect with the seq-4 values
    val resurrected = applied.filter(col("key") % 13 === 0 && col("key") % 17 === 3)
    if (resurrected.count() > 0)
      assert(resurrected.filter(col("status") =!= "L" || col("last_seq") =!= 4).count() === 0L)
    // compaction is a single hash aggregate: no window, no sort below the agg
    val plan = applied.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    log.unpersist(); applied.unpersist()
  }

  test("bucket reconcile: mismatches are exactly the diff-touched buckets; clean ones prune (r8)") {
    val old = graft.sync.Snapshots.oldSnapshot(customer)
    val neu = graft.sync.Snapshots.newSnapshot(customer)
    val rec = graft.sync.SnapshotDiff.bucketReconcile(old, neu).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    val touched = graft.sync.SnapshotDiff.diffKeyed(old, neu, "slno").collect()
      .map(_.getLong(1) / 4).toSet
    val mismatched = rec.collect { case (b, (_, _, 0)) => b }.toSet
    assert(mismatched === touched,
      s"extra: ${mismatched -- touched}, missed: ${touched -- mismatched}")
    // the pre-check must PRUNE something on this fixture or it's inert
    assert(rec.values.exists(_._3 == 1))
    // counts reconcile with the raw sides
    assert(rec.values.map(_._1).sum === old.count())
    assert(rec.values.map(_._2).sum === neu.count())
  }

  test("reconciled diff: changeset EXACTLY equals the full diff; clean buckets skip the cell diff (r9)") {
    val old = Snapshots.oldSnapshot(customer)
    val neu = Snapshots.newSnapshot(customer)
    val full = SnapshotDiff.diffKeyed(old, neu, "slno")
    val reconciled = SnapshotDiff.diffReconciled(old, neu, "slno")
    // the composition law: pruning clean buckets changes the plan, never
    // the changeset
    assert(reconciled.exceptAll(full).count() === 0L)
    assert(full.exceptAll(reconciled).count() === 0L)
    // ...and the pruning is REAL on this fixture (non-vacuous: the wide
    // diff join must see strictly fewer rows than the raw sides), or the
    // operator is just diffKeyed with extra steps
    val dirty = SnapshotDiff.bucketReconcile(old, neu)
      .filter(col("is_match") === 0).select("bucket").collect()
      .map(_.getLong(0)).toSet
    val oldPruned = old.filter(expr("slno div 4").isin(dirty.toSeq: _*)).count()
    assert(oldPruned < old.count(), "fixture has no clean buckets — pruning is vacuous")
    // empty-diff degenerate: identical sides reconcile to an empty dirty
    // list and an empty changeset (no crash on the empty semi-join side)
    assert(SnapshotDiff.diffReconciled(old, old, "slno").count() === 0L)
  }

  test("keyed diff classifies inserts/deletes/updates correctly") {
    val old = Snapshots.oldSnapshot(customer)
    val neu = Snapshots.newSnapshot(customer)
    val d = SnapshotDiff.diffKeyed(old, neu, "slno").cache()
    val byOp = d.groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // inserts = keys ≡49 (mod 50) minus those also ≡0 (mod 43); deletes = ≡0 (mod 43) ∩ old
    val oldKeys = old.select("slno").collect().map(_.getLong(0)).toSet
    val newKeys = neu.select("slno").collect().map(_.getLong(0)).toSet
    assert(byOp.getOrElse("insert", 0L) === (newKeys -- oldKeys).size.toLong)
    assert(byOp.getOrElse("delete", 0L) === (oldKeys -- newKeys).size.toLong)
    assert(byOp.getOrElse("update", 0L) > 0)
    d.unpersist()
  }

  test("merge3Way: one-sided merge degenerates to taking ours (r8)") {
    val base = Snapshots.oldSnapshot(customer)
    val ours = Snapshots.oursSnapshot(customer)
    // theirs == base: every surviving row must equal ours' row verbatim
    val m = SnapshotDiff.merge3Way(base, ours, base, "slno").cache()
    assert(m.filter(col("action").isin("conflict", "theirs", "both", "merged",
      "delete_conflict", "insert_conflict", "insert_theirs", "delete_both")).count() === 0)
    val survivors = m.filter(!col("action").startsWith("delete"))
      .select(col("slno"), col("name"), col("acctbal"), col("segment"))
    val oursAll = ours.select(col("slno").cast("long").as("slno"),
      col("name"), col("acctbal"), col("segment"))
    assert(survivors.exceptAll(oursAll).count() === 0)
    assert(oursAll.exceptAll(survivors).count() === 0)
    m.unpersist()
  }

  test("merge3Way: swapping ours/theirs mirrors actions and preserves cells (r8)") {
    val base = Snapshots.oldSnapshot(customer)
    val ours = Snapshots.oursSnapshot(customer)
    val theirs = Snapshots.theirsSnapshot(customer)
    val ab = SnapshotDiff.merge3Way(base, ours, theirs, "slno")
    val ba = SnapshotDiff.merge3Way(base, theirs, ours, "slno")
    val swap = Map("ours" -> "theirs", "theirs" -> "ours",
      "delete_ours" -> "delete_theirs", "delete_theirs" -> "delete_ours",
      "insert_ours" -> "insert_theirs", "insert_theirs" -> "insert_ours")
    val abRows = ab.collect().map(r => r.getLong(0) -> r).toMap
    val baRows = ba.collect().map(r => r.getLong(0) -> r).toMap
    assert(abRows.keySet === baRows.keySet)
    abRows.foreach { case (k, r) =>
      val s = baRows(k)
      assert(swap.getOrElse(r.getString(1), r.getString(1)) === s.getString(1), s"action@$k")
      assert(r.getString(2) === s.getString(2), s"conflict_cols@$k")
      (3 to 5).foreach(i => assert(r.get(i) === s.get(i), s"cell $i@$k"))
    }
  }

  test("merge3Way: the synthesis populates every class, spot keys classify right (r8)") {
    val m = SnapshotDiff.merge3Way(Snapshots.oldSnapshot(customer),
        Snapshots.oursSnapshot(customer), Snapshots.theirsSnapshot(customer), "slno")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // hand-derived classifications from the documented moduli
    assert(m(35L) === ("conflict", "acctbal"))  // +100 (ours) vs +50 (theirs)
    assert(m(22L) === ("conflict", "segment"))  // OURS-SEG vs THEIRS-SEG
    assert(m(13L) === ("both", ""))             // convergent upper(name)
    assert(m(55L) === ("merged", ""))           // ours segment + theirs acctbal
    assert(m(21L)._1 === "delete_ours")
    assert(m(27L)._1 === "delete_theirs")
    assert(m(105L)._1 === "delete_conflict")    // ours deleted, theirs bumped
    assert(m(149L) === ("insert_both", ""))     // mod-50 hole, untouched by either
    assert(m(49L) === ("insert_conflict", "acctbal")) // hole + ours-only bump
    assert(m(1L) === ("keep", ""))
    assert(m(7L)._1 === "ours"); assert(m(5L)._1 === "theirs")
  }
}
